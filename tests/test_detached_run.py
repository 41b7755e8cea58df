"""Detached (nohup) execution helper (reference utils/detached_run.py:11-48)."""
import os
import sys
from argparse import Namespace

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli


def test_noop_without_offline():
    maybe_run_detached_cli(Namespace(offline=False, output="/nonexistent"))
    maybe_run_detached_cli(Namespace())  # flag absent entirely


def test_detaches_and_strips_offline_flag(tmp_path, monkeypatch):
    spawned = {}

    def fake_popen(cmd, **kwargs):
        spawned["cmd"] = cmd
        spawned["kwargs"] = kwargs
        class P:  # minimal Popen stand-in
            pid = 12345
        return P()

    monkeypatch.setattr("subprocess.Popen", fake_popen)
    monkeypatch.setattr(sys, "argv",
                        ["train_point_seg.py", "--offline", "--pts", "128"])
    with pytest.raises(SystemExit):
        maybe_run_detached_cli(Namespace(offline=True, output=str(tmp_path)))

    assert spawned["cmd"][:3] == ["nohup", sys.executable, "-u"]
    assert "--offline" not in spawned["cmd"]          # no re-detach loop
    assert "--pts" in spawned["cmd"]
    logs = os.listdir(tmp_path / "logs")
    assert len(logs) == 1 and logs[0].startswith("train_point_seg_")
