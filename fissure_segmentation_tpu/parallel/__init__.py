from .mesh import make_mesh, shard_along, replicate  # noqa: F401
from .ensemble import sharded_ensemble_predict  # noqa: F401
