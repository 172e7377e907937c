from tgi.ops.filters import setup_filter
from tgi.ops.upfirdn2d import upfirdn2d, filter2d, upsample2d, downsample2d
from tgi.ops.bias_act import bias_act, activation_funcs
from tgi.ops.conv2d_resample import conv2d_resample
from tgi.ops.grid_sample import grid_sample_2d, sample_triplanes
from tgi.ops.fma import fma
from tgi.ops.filtered_lrelu import filtered_lrelu

__all__ = [
    "setup_filter", "upfirdn2d", "filter2d", "upsample2d", "downsample2d",
    "bias_act", "activation_funcs", "conv2d_resample", "grid_sample_2d",
    "sample_triplanes", "fma", "filtered_lrelu",
]
