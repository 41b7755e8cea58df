from .blocks import SharedMLP, MLPStack  # noqa: F401
from .dgcnn import DGCNNSeg, DGCNNReg  # noqa: F401
from .pointnet import PointNetSeg  # noqa: F401
from .io import save_model, load_model, MODEL_REGISTRY, register_model  # noqa: F401
from .ensemble import ensemble_predict  # noqa: F401
from .access_models import get_point_seg_model_class  # noqa: F401
