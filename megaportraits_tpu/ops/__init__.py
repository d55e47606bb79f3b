from megaportraits_tpu.ops.resize import (
    linear_resize,
    nearest_resize,
    upsample_nearest,
    avg_pool_2d,
    avg_pool_3d,
    anti_alias_downsample,
    gaussian_kernel_2d,
)
from megaportraits_tpu.ops.affine_grid import (
    rotation_matrix_from_euler_deg,
    affine_grid_3d,
    compute_rt_warp,
)
from megaportraits_tpu.ops.warp import (
    grid_sample_3d,
    apply_warping_field,
)
