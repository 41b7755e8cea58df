from .knn import knn, pairwise_sqdist  # noqa: F401
from .edge import gather_neighbors, edge_features, edge_mlp_pre_gather  # noqa: F401
