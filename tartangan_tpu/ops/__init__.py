from .resize import (  # noqa: F401
    avg_pool_2x,
    downsample_bilinear_half,
    max_pool_2x,
    resize_bilinear,
    resize_linear_1d,
    upsample_nearest_2x,
)
