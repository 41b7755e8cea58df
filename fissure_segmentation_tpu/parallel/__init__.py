from .mesh import make_mesh, shard_along, replicate  # noqa: F401
from .ensemble import sharded_ensemble_predict  # noqa: F401
from .spatial import (halo_exchange, halo_reduce, halo_exchange_down,  # noqa: F401
                      halo_reduce_down, sharded_predict_all_patches)
from .points import (sharded_knn, sharded_gather_neighbors,  # noqa: F401
                     sharded_edge_features)
