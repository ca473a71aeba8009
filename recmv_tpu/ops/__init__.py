from .embedder import Embedder, get_embedder, annealing_weights
from .math3d import (
    fast_3x3_inv,
    quat2mat,
    batch_rodrigues,
    rotmat_to_axis_angle,
    rotation_6d_to_matrix,
    gm_robust_error,
    compute_face_areas,
    compute_fnorms,
    compute_vnorms,
    dct_basis,
    dct_null_space,
    dct_space,
)
from .grid_sample import (
    grid_sample_3d,
    grid_sample_2d,
    resize_trilinear,
    interp2x_boundary3d,
    max_pool_3d_same,
)
