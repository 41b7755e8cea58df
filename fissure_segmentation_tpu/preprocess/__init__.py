from .labels import (binary_morphology, find_fissures, find_lobes,  # noqa: F401
                     fissures_between_lobes, generate_lung_mask,
                     find_non_zero_range, label_to_mesh,
                     binary_lung_mask_to_left_right,
                     check_left_right_lung_plausible)
from .pipeline import (create_case_meshes, label_pipeline_case,  # noqa: F401
                       preprocess_totalsegmentator_case, save_meshes)
