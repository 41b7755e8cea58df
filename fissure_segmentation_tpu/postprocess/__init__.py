from .surface_fitting import (pointcloud_surface_fitting, poisson_reconstruction,  # noqa: F401
                              mesh_to_labelmap, keep_largest_component)
