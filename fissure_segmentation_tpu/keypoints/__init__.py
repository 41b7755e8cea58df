from .foerstner import foerstner_keypoints, distinctiveness, structure_tensor  # noqa: F401
from .hessian import hessian_fissure_enhancement, eigvalsh3  # noqa: F401
from .features import mind, compute_point_features, descriptor_at_keypoints  # noqa: F401
from .enhancement_eval import fissure_candidates, threshold_curves  # noqa: F401
from .extraction import (MAX_KPTS, compute_keypoints,  # noqa: F401
                         get_cnn_keypoints, get_enhancement_keypoints,
                         get_noisy_keypoints)

