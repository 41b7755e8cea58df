"""Regenerate README.md's headline-numbers section from a bench artifact.

VERDICT r2-r4 flagged README performance numbers drifting from the driver's
authoritative `BENCH_r*.json` three rounds running. This script makes the
bench JSON the single source of truth: the whole headline block (table +
fast/pipelined paragraphs) is GENERATED between markers

    <!-- bench-sync:begin <artifact.json> -->
    ...
    <!-- bench-sync:end -->

and `tests/test_readme_sync.py` re-renders it from the newest committed
artifact and asserts byte equality — a README edit that touches a number by
hand fails the suite.

Usage:
    python scripts/sync_readme_bench.py [artifact.json]   # default: newest
    python scripts/sync_readme_bench.py --check           # exit 1 on drift
"""
from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference numbers (BASELINE.md / reference performance_time_plot.py:31-34)
REF_FOERSTNER = 1.352
REF_HESSIAN = 36.81
REF_CNN = 6.786
REF_PCAE = 0.418

BEGIN_RE = re.compile(r"<!-- bench-sync:begin (\S+) -->")
END = "<!-- bench-sync:end -->"


def newest_artifact() -> str:
    """Newest bench artifact by round number. A local run
    (BENCH_r05_local.json — `python bench.py` on the same chip/protocol)
    outranks the PREVIOUS round's driver file, but the driver's own
    artifact for the same round outranks the local one (authoritative)."""
    best, best_key = None, (-1, -1)
    for f in os.listdir(REPO):
        m = re.match(r"BENCH_r(\d+)(_local)?\.json$", f)
        if m:
            key = (int(m.group(1)), 0 if m.group(2) else 1)
            if key > best_key:
                best, best_key = f, key
    if best is None:
        raise FileNotFoundError("no BENCH_r*.json artifact in repo root")
    return best


def render(artifact: str) -> str:
    with open(os.path.join(REPO, artifact)) as f:
        bench = json.load(f)
    parsed = bench.get("parsed", bench)   # driver artifact vs raw bench line
    value = parsed["value"]
    vsb = parsed["vs_baseline"]
    d = parsed["details"]

    def spd(x):
        return f"{x:.1f}×"

    fast = d.get("fused_fast_s_per_case")
    pipe = d.get("serving_pipelined_s_per_case")
    pipe_rate = d.get("serving_pipelined_cases_per_sec")
    lines = [
        f"<!-- bench-sync:begin {artifact} -->",
        "**Headline numbers** (one TPU v5e chip, tunnel-attached; every",
        f"number in this block is machine-generated from `{artifact}`",
        "by `scripts/sync_readme_bench.py` — the same `bench.py` protocol",
        "the round driver runs (warm-up then medians: 8 interleaved",
        "repeats for the exact/fast Förstner rows, 6 repeats for the",
        "Hessian and CNN rows); `tests/test_readme_sync.py` fails if this block",
        "and the artifact disagree. Tunnel session-to-session variance is",
        "~±10-15% on serving rows — when the driver's own `BENCH_rNN.json`",
        "re-measurement lands, re-running the sync script replaces this",
        "block with it. Reference numbers from the reference's own pareto",
        "figure, `performance_time_plot.py:31-34`, and `BASELINE.md`):",
        "",
        "| Pipeline / metric | This repo | Reference (CUDA GPU) | speedup |",
        "|---|---|---|---|",
        "| Full case, Förstner keypoints (256³ CT → 50×2048 DGCNN"
        " ensemble → 3× spectral-PSR mesh + labelmap; fused one-dispatch"
        " serving path, `serving.segment_case`) | "
        f"**{value:.3f} s/case** | {REF_FOERSTNER} s/case | **{spd(vsb)}** |",
        "| Full case, Hessian-enhancement keypoints | "
        f"**{d['hessian_pipeline_s_per_case']:.3f} s/case** |"
        f" {REF_HESSIAN} s/case | **{spd(d['hessian_vs_baseline'])}** |",
        "| Full case, pre-seg-CNN keypoints (single-pass full-volume"
        " MobileNetASPP; bf16 ensemble + distribution-preserving approx"
        " random subsample) | "
        f"**{d['cnn_pipeline_s_per_case']:.3f} s/case** |"
        f" {REF_CNN} s/case | **{spd(d['cnn_vs_baseline'])}** |",
        "| Full case, DGCNN + PC-AE mesh decode (Förstner) | "
        f"**{d['pcae_pipeline_s_per_case']:.3f} s/case** |"
        f" {REF_PCAE} s/case | **{spd(d['pcae_vs_baseline'])}** |",
        "| DGCNN seg training fwd+bwd (batch 32 × 2048 pts, k=40 static,"
        " NNU loss + Adam) | "
        f"**{d['train_dgcnn_bf16_clouds_per_sec']:.0f} clouds/s/chip** bf16"
        f" ({d['train_dgcnn_bf16_step_ms']:.1f} ms/step; f32:"
        f" {d['train_dgcnn_clouds_per_sec']:.0f}; `--knn_recall 0.9` approx"
        f" graphs: {d['train_dgcnn_bf16_knn_recall_0.9_clouds_per_sec']:.0f}"
        f" at {d['train_dgcnn_bf16_knn_recall_0.9_step_ms']:.1f} ms)"
        " | — (north-star metric, `BASELINE.json`) | — |",
    ]
    para = []
    if fast is not None:
        rel = ("faster than" if fast < value else "slower than"
               if fast > value else "equal to")
        para.append(
            "An opt-in fast serving variant (`segment_case(...,"
            " approx_top_k=True)` with a bf16 / `knn_recall=0.9` model)"
            f" measures **{fast:.3f} s/case** ({rel} the exact row above in"
            " the same artifact); `bench.py` reports it as"
            " `fused_fast_s_per_case`.")
    if pipe is not None:
        fast_pipe = d.get("serving_pipelined_fast_s_per_case")
        fast_note = ("" if fast_pipe is None else
                     f" (fast variant: {fast_pipe:.3f} s/case ="
                     f" {d['serving_pipelined_fast_cases_per_sec']:.2f}"
                     " cases/s)")
        para.append(
            "For batch workloads, `serving.segment_cases` overlaps case"
            " i's packed fetch + host filtering with case i+1's device"
            f" compute and measures **{pipe:.3f} s/case ="
            f" {pipe_rate:.2f} cases/s** on the exact configuration"
            f"{fast_note} — the reference's test loop is strictly serial.")
    para.append(
        "`PERF.md` holds the per-stage decompositions behind every row and"
        " the measurement methodology (chained scans, tunnel RTT"
        " accounting).")
    lines += ["", "\n".join(para), END]
    return "\n".join(lines)


def sync(artifact: str | None = None, check: bool = False) -> bool:
    """Rewrite (or with check=True, verify) the README block.
    Returns True if the README was already in sync."""
    artifact = artifact or newest_artifact()
    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as f:
        text = f.read()
    m = BEGIN_RE.search(text)
    if not m or END not in text:
        raise RuntimeError("README.md bench-sync markers not found")
    start, end = m.start(), text.index(END) + len(END)
    block = render(artifact)
    in_sync = text[start:end] == block
    if not check and not in_sync:
        with open(readme_path, "w") as f:
            f.write(text[:start] + block + text[end:])
    return in_sync


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--check"]
    check = "--check" in sys.argv[1:]
    ok = sync(args[0] if args else None, check=check)
    if check and not ok:
        print("README.md headline block is OUT OF SYNC with the newest "
              "bench artifact; run scripts/sync_readme_bench.py",
              file=sys.stderr)
        sys.exit(1)
    print("README.md in sync" if ok else "README.md updated")
