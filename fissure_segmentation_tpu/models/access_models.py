"""Model registry / name dispatch (reference models/access_models.py)."""
from __future__ import annotations

from .dgcnn import DGCNNReg, DGCNNSeg
from .io import register_model
from .pointnet import PointNetSeg
from .point_transformer import PointTransformerSeg

register_model(DGCNNSeg)
register_model(DGCNNReg)
register_model(PointNetSeg)
register_model(PointTransformerSeg)

_POINT_SEG_MODELS = {
    "DGCNN": DGCNNSeg,
    "PointNet": PointNetSeg,
    "PointTransformer": PointTransformerSeg,
}


def get_seg_cnn_model_class(name: str):
    """Voxel-CNN dispatch ('v1' MobileNet+ASPP / 'v3' LR-ASPP MobileNetV3,
    reference cli_args.py:133 + access via train_segmentation_net.py)."""
    from .lraspp_3d import LRASPPMobileNetV33D
    from .seg_cnn import MobileNetASPP
    register_model(MobileNetASPP)
    register_model(LRASPPMobileNetV33D)
    models = {"v1": MobileNetASPP, "v3": LRASPPMobileNetV33D}
    try:
        return models[name]
    except KeyError:
        raise ValueError(f"unknown seg CNN {name!r}; known: v1, v3") from None


def get_point_seg_model_class(name: str):
    """Reference access_models.get_point_seg_model_class_from_args:18."""
    try:
        return _POINT_SEG_MODELS[name]
    except KeyError:
        raise ValueError(
            f"unknown point segmentation model {name!r}; "
            f"known: {sorted(_POINT_SEG_MODELS)}") from None
