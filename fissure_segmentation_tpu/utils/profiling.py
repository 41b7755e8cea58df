"""Profiling: parameter/FLOP counts and timing helpers.

Counterpart of reference thesis/utils.py:21-38 (thop/ptflops
`param_and_op_count` writing op_count.csv, called from every entry script)
and train.py:349-448 (CUDA-event `speed_test` writing inference_time CSVs).
TPU-native: FLOPs come from XLA's own cost analysis of the *compiled*
computation (`jit(...).lower().compile().cost_analysis()`), timings from
`block_until_ready` walls, and deep traces from `jax.profiler`.
"""
from __future__ import annotations

import csv
import os
import time
from typing import Callable

import jax
import numpy as np


def count_parameters(variables) -> int:
    params = variables.get("params", variables)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def cost_analysis(fn: Callable, *example_args, **example_kwargs) -> dict:
    """XLA cost analysis of the jit-compiled `fn`: flops, bytes accessed,
    transcendentals — the compiler's ground truth, unlike the reference's
    module-hook estimates (thesis/utils.py:21)."""
    compiled = jax.jit(fn).lower(*example_args, **example_kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per computation
        ca = ca[0]
    return {k: ca.get(k, 0.0) for k in
            ("flops", "bytes accessed", "transcendentals")}


def param_and_op_count(fn: Callable, example_args, variables=None,
                       out_dir: str | None = None,
                       filename: str = "op_count.csv") -> dict:
    """FLOP + parameter count, optionally written as op_count.csv
    (thesis/utils.py:21-38 artifact layout)."""
    costs = cost_analysis(fn, *example_args)
    row = {"flops": costs["flops"],
           "bytes_accessed": costs["bytes accessed"],
           "params": count_parameters(variables) if variables is not None else 0}
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, filename), "w") as f:
            w = csv.writer(f)
            w.writerow(list(row))
            w.writerow([row[k] for k in row])
    return row


def time_fn(fn: Callable, *args, repeats: int = 10, warmup: int = 1,
            **kwargs) -> dict:
    """block_until_ready wall times (train.py:349-424 semantics: explicit
    sync around each run, mean/std over repeats after warmup)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {"mean_s": float(np.mean(times)), "std_s": float(np.std(times)),
            "min_s": float(np.min(times)), "times": times}


def trace(out_dir: str):
    """Context manager: write a jax.profiler trace viewable in TensorBoard /
    Perfetto (the TPU-native replacement for the reference's CUDA-event
    timing breakdowns)."""
    return jax.profiler.trace(out_dir)
