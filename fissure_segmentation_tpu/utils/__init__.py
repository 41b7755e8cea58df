from .coords import ALIGN_CORNERS, kpts_to_grid, kpts_to_world  # noqa: F401
