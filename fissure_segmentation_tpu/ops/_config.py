"""Shared configuration for Pallas kernels."""
import jax


def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"
