from frn_tpu.ops.attention import nonlocal_attention, reference_view_to_nhwc
from frn_tpu.ops.upsample import bilinear_resize, nearest_upsample_2x

__all__ = [
    "nonlocal_attention",
    "reference_view_to_nhwc",
    "bilinear_resize",
    "nearest_upsample_2x",
]
