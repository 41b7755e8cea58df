from .augmentation import point_augmentation, compose_transform, transform_points  # noqa: F401
from .store import PointCloudStore, sample_batch  # noqa: F401
from .dataset import PointDataset, compute_class_weights, create_split, load_split_file, save_split_file  # noqa: F401
from .synthetic import (make_synthetic_case, make_synthetic_dataset,  # noqa: F401
                        make_synthetic_meshes, make_synthetic_mesh_dataset,
                        make_synthetic_image_case)
from .image_dataset import (LungDataIndex, ImageDataset,  # noqa: F401
                            augment_image_batch, random_patch_crop)
from .mesh_dataset import (MeshStore, build_mesh_store, load_meshes,  # noqa: F401
                           sample_mesh_batch, SampleFromMeshDS, PointToMeshDS,
                           CorrespondingPointDataset)
