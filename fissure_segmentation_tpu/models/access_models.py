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


def get_point_seg_model_class(name: str):
    """Reference access_models.get_point_seg_model_class_from_args:18."""
    try:
        return _POINT_SEG_MODELS[name]
    except KeyError:
        raise ValueError(
            f"unknown point segmentation model {name!r}; "
            f"known: {sorted(_POINT_SEG_MODELS)}") from None
