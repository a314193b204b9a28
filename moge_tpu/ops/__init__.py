from . import alignment, attention, geometry, resize, solvers
from .alignment import (
    align,
    align_affine_lstsq,
    align_depth_affine,
    align_depth_scale,
    align_points_scale,
    align_points_scale_xyz_shift,
    align_points_scale_z_shift,
    align_points_xyz_shift,
    align_points_z_shift,
)
from .attention import flash_attention, scaled_dot_product_attention
from .geometry import (
    angle_between,
    angle_diff_vec3,
    depth_map_edge,
    dilate_with_mask,
    refine_depth_with_normal,
    safe_norm,
    sliding_window_2d,
    depth_map_to_normal_map,
    depth_map_to_point_map,
    focal_to_fov,
    fov_to_focal,
    gaussian_blur_2d,
    geometric_mean,
    harmonic_mean,
    intrinsics_from_focal_center,
    intrinsics_from_fov,
    intrinsics_to_fov,
    masked_nearest_resize,
    normal_map_edge,
    normalized_view_plane_uv,
    point_map_to_depth_legacy,
    point_map_to_normal_map,
    project_cv,
    threshold_depth_change,
    unproject_cv,
    uv_map,
    weighted_mean,
)
from .resize import resize_2d, resize_image, resize_matrix
from .solvers import recover_focal_shift, solve_optimal_focal_shift, solve_optimal_shift
