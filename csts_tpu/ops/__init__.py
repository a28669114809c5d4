from .conv import (
    conv3d,
    conv3d_init,
    depthwise_conv3d,
    depthwise_conv_transpose3d,
    max_pool3d,
    avg_pool3d,
)
from .norm import layer_norm, layer_norm_init
from .common import (
    mlp_apply,
    mlp_init,
    linear_apply,
    linear_init,
    gelu,
    drop_path,
    trunc_normal,
)
from .resize import trilinear_resize

__all__ = [
    "conv3d",
    "conv3d_init",
    "depthwise_conv3d",
    "depthwise_conv_transpose3d",
    "max_pool3d",
    "avg_pool3d",
    "layer_norm",
    "layer_norm_init",
    "mlp_apply",
    "mlp_init",
    "linear_apply",
    "linear_init",
    "gelu",
    "drop_path",
    "trunc_normal",
    "trilinear_resize",
]
