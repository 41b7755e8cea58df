from .registry import Losses, get_loss_fn  # noqa: F401
from .segmentation import nnu_loss, cross_entropy, generalized_dice_loss, batch_recall_loss  # noqa: F401
from .chamfer import chamfer_distance, chamfer_loss  # noqa: F401
