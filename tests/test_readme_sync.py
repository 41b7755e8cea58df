"""README headline numbers must match the newest committed bench artifact.

VERDICT r2-r4: hand-transcribed README numbers drifted from the driver's
authoritative `BENCH_r*.json` three rounds running. The headline block is
machine-generated (`scripts/sync_readme_bench.py`); these tests pin
(a) that the block in the tree equals a fresh render of the artifact it
names, and (b) that the named artifact is the newest one committed.
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from sync_readme_bench import BEGIN_RE, newest_artifact, sync  # noqa: E402


def test_readme_block_matches_artifact():
    assert sync(check=True), (
        "README.md headline block is out of sync with the newest bench "
        "artifact — run: python scripts/sync_readme_bench.py")


def test_readme_names_newest_artifact():
    with open(os.path.join(REPO, "README.md")) as f:
        m = BEGIN_RE.search(f.read())
    assert m, "README.md bench-sync markers missing"
    assert m.group(1) == newest_artifact(), (
        f"README.md quotes {m.group(1)} but the newest committed artifact "
        f"is {newest_artifact()} — run: python scripts/sync_readme_bench.py")


def test_no_stale_headline_numbers_outside_block():
    """The generated block must be the ONLY place README states serving
    latencies: any other 's/case' mention outside it would reintroduce the
    hand-edited-number drift this machinery exists to prevent."""
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    start = BEGIN_RE.search(text).start()
    end = text.index("<!-- bench-sync:end -->")
    outside = text[:start] + text[end:]
    assert not re.search(r"\d\s*(s|ms)/case", outside), (
        "README.md quotes a per-case latency outside the bench-sync block")
