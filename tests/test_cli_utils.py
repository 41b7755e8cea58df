"""Args persistence + test-time override merge (reference
cli/cli_utils.py:7-57 semantics)."""
import os
import sys
from argparse import Namespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fissure_segmentation_tpu.cli.utils import (load_args,
                                                load_args_for_testing,
                                                store_args)


def _train_args(**over):
    base = dict(test_only=False, train_only=False, show=False, gpu=0,
                fold=None, copd=False, speed=False, data_dir="data_train",
                pts=2048, k=40, static=True, lr=1e-3)
    base.update(over)
    return Namespace(**base)


def test_store_load_roundtrip(tmp_path):
    args = _train_args()
    store_args(args, str(tmp_path))
    assert load_args(str(tmp_path)).__dict__ == args.__dict__


def test_override_whitelist_keeps_model_hparams(tmp_path):
    store_args(_train_args(), str(tmp_path))
    test_args = _train_args(test_only=True, fold=3, pts=512, k=10, lr=9.9,
                            data_dir=None)
    merged = load_args_for_testing(str(tmp_path), test_args)
    # whitelisted keys follow the test invocation
    assert merged.test_only is True and merged.fold == 3
    # model hyperparameters come from the stored training run
    assert merged.pts == 2048 and merged.k == 40 and merged.lr == 1e-3
    # absent --data_dir keeps the training-time path
    assert merged.data_dir == "data_train"


def test_explicit_data_dir_wins_at_test_time(tmp_path):
    store_args(_train_args(), str(tmp_path))
    merged = load_args_for_testing(
        str(tmp_path), _train_args(copd=True, data_dir="data_copd"))
    assert merged.data_dir == "data_copd"
    assert merged.test_only is True  # copd forces test_only


def test_forward_compat_key_fill(tmp_path):
    store_args(_train_args(), str(tmp_path))
    test_args = _train_args(test_only=True, data_dir=None)
    test_args.new_flag_added_later = "x"
    merged = load_args_for_testing(str(tmp_path), test_args)
    assert merged.new_flag_added_later == "x"
