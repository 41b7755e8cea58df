from .ssm import SSMParams, fit_ssm, ssm_project, ssm_decode, ssm_random_samples, save_ssm, load_ssm  # noqa: F401
from .lssm import fit_lssm  # noqa: F401
from .registration import TPS, thin_plate_dense, register_cpd_rigid, register_cpd_deformable  # noqa: F401
from .correspondences import (generate_corresponding_points,  # noqa: F401
                              save_corresponding_points, load_corresponding_points)
from .qualitative import (visualize_reconstruction,  # noqa: F401
                          visualize_ssm_samples, latent_interpolation,
                          sample_shapes_to_npz, load_shape_npz)
from .adam_registration import (register_images,  # noqa: F401
                                dense_adam_registration, registration_features,
                                upsample_displacement, warp_volume,
                                landmark_tre_mm)
