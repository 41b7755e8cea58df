"""Model checkpointing: config-capturing save/load.

TPU-native counterpart of reference models/modelio.py:20-89 (LoadableModel +
store_config_args): a checkpoint stores the model *class name and constructor
config* next to the weights, so `load_model(path)` reconstructs the exact
architecture without the caller re-specifying it.

Format: single file = JSON header (class name, config, format version) +
b"\\0" separator + flax msgpack bytes of the variables pytree.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Type

import flax.linen as nn
import flax.serialization
import numpy as np

_SEP = b"\x00fst\x00"
MODEL_REGISTRY: dict[str, Type[nn.Module]] = {}


def register_model(cls: Type[nn.Module]) -> Type[nn.Module]:
    MODEL_REGISTRY[cls.__name__] = cls
    return cls


def _module_config(module: nn.Module) -> dict[str, Any]:
    """Constructor kwargs of a linen module (its dataclass fields)."""
    cfg = {}
    for f in dataclasses.fields(module):
        if f.name in ("parent", "name"):
            continue
        v = getattr(module, f.name)
        if isinstance(v, tuple):
            v = list(v)
        elif isinstance(v, (type, np.dtype)):
            # compute-dtype fields (e.g. dtype=jnp.bfloat16 from --amp)
            v = {"__dtype__": np.dtype(v).name}
        cfg[f.name] = v
    return cfg


def save_model(module: nn.Module, variables: Any, path: str) -> None:
    """Save architecture config + weights to a single file."""
    # format 2 = EdgeConv parameter tree uses EdgeMLP (fused pre-gather
    # matmul) instead of SharedMLP_0; format-1 DGCNN-family checkpoints
    # have an incompatible param tree.
    header = json.dumps({
        "format": 2,
        "model_class": type(module).__name__,
        "config": _module_config(module),
    }).encode()
    payload = flax.serialization.to_bytes(variables)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(header + _SEP + payload)


def load_model(path: str):
    """Load (module, variables) from a checkpoint written by save_model."""
    with open(path, "rb") as f:
        blob = f.read()
    header_bytes, payload = blob.split(_SEP, 1)
    header = json.loads(header_bytes)
    cls = MODEL_REGISTRY.get(header["model_class"])
    if cls is None:
        raise KeyError(
            f"model class {header['model_class']!r} is not registered; "
            f"known: {sorted(MODEL_REGISTRY)}")
    config = {k: (tuple(v) if isinstance(v, list)
                  else np.dtype(v["__dtype__"])
                  if isinstance(v, dict) and "__dtype__" in v else v)
              for k, v in header["config"].items()}
    module = cls(**config)
    # Build a template pytree so msgpack restores correct dtypes/shapes.
    variables = flax.serialization.msgpack_restore(payload)
    if header.get("format", 1) < 2 and any(
            "EdgeMLP" in k for k in _flat_keys(variables)) is False \
            and any("SharedMLP" in k for k in _flat_keys(variables)):
        import warnings
        warnings.warn(
            f"{path} was saved before the EdgeConv EdgeMLP refactor "
            "(format 1); DGCNN-family models will fail to apply these "
            "parameters. Re-train or re-save with the current code.")
    return module, variables


def _flat_keys(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_keys(v, f"{prefix}/{k}")
    else:
        yield prefix
