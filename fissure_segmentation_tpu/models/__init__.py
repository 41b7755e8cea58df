from .blocks import SharedMLP, MLPStack  # noqa: F401
from .dgcnn import DGCNNSeg, DGCNNReg  # noqa: F401
from .pointnet import PointNetSeg  # noqa: F401
from .io import save_model, load_model, MODEL_REGISTRY, register_model  # noqa: F401
from .ensemble import ensemble_predict  # noqa: F401
from .access_models import get_point_seg_model_class  # noqa: F401
from .folding_net import DGCNNFoldingNet  # noqa: F401
from .dgcnn_cls import DGCNNCls, MultiHeadDGCNN, RegressionHead  # noqa: F401
from .dg_ssm import DGSSM, dgssm_ensemble_predict  # noqa: F401
from .dpsr_net import DPSRNet, DPSRNet2  # noqa: F401
from .seg_cnn import (MobileNetASPP, predict_all_patches,  # noqa: F401
                      predict_full_volume)
from .lraspp_3d import LRASPPMobileNetV33D  # noqa: F401
from .dseg_ae import RegularizedSegDGCNN  # noqa: F401
from .affine import (AffineDGCNN, AffineOpenDGCNN, AffinePointNet,  # noqa: F401
                     AFFINE_MODELS, PointNetCls)

for _cls in (DGCNNFoldingNet, DGSSM, DPSRNet, DPSRNet2, MobileNetASPP,
             LRASPPMobileNetV33D):
    register_model(_cls)
del _cls
