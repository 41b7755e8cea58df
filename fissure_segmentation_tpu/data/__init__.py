from .augmentation import point_augmentation, compose_transform, transform_points  # noqa: F401
from .store import PointCloudStore, sample_batch  # noqa: F401
from .dataset import PointDataset, compute_class_weights, create_split, load_split_file, save_split_file  # noqa: F401
from .synthetic import make_synthetic_case, make_synthetic_dataset  # noqa: F401
