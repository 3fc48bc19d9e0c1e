"""Numerics layer: pure-JAX (and Pallas) tensor ops shared by models and losses.

All ops take NHWC tensors; flow fields are ``(B, H, W, 2)`` with
``[..., 0] = u`` (horizontal / x) and ``[..., 1] = v`` (vertical / y).
"""

from arflow_tpu.ops.warp import (  # noqa: F401
    flow_to_warp,
    mask_invalid,
    resample,
    resample_with_grads,
    flow_warp,
    border_mask,
    bilinear_gather,
)
from arflow_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_area,
    upsample,
    downsample,
    resize_flow,
    image_grads,
)
from arflow_tpu.ops.census import (  # noqa: F401
    rgb_to_grayscale,
    census_transform,
    soft_hamming,
    zero_mask_border,
    census_loss,
    census_loss_no_penalty,
    abs_robust_loss,
    robust_l1,
)
from arflow_tpu.ops.ssim import ssim_loss, ssim_dist, avg_pool  # noqa: F401
from arflow_tpu.ops.occlusion import (  # noqa: F401
    compute_range_map,
    get_corresponding_map,
    get_occu_mask_bidirection,
    get_occu_mask_backward,
)
from arflow_tpu.ops.cost_volume import (  # noqa: F401
    compute_cost_volume,
    normalize_features,
)
from arflow_tpu.ops.penalties import get_penalty, log_gmm  # noqa: F401
from arflow_tpu.ops.triag import (  # noqa: F401
    matrix_vector_product,
    matrix_vector_product_T,
    matrix_vector_product_general,
    matrix_vector_product_T_general,
    forward_substitution,
    backward_substitution,
    inverse_diagonal,
)
