"""Pallas TPU kernels for the hot point-cloud ops.

Each kernel has an XLA reference implementation in ``ops/`` used as ground
truth in tests; off-TPU the kernels run in interpreter mode (tiny shapes
only). Dispatch helpers in the XLA modules pick the Pallas path on TPU.
"""
from .knn import knn_pallas  # noqa: F401
from .fps import fps_pallas  # noqa: F401
