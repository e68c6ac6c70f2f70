from .conv import conv2d, conv_transpose2d, depthwise_conv2d, DIMENSION_NUMBERS
from .resize import upsample_nearest_2x, bilinear_resize, global_avg_pool
from .norm import pixel_norm, instance_norm
from .blur import blur_3x3
from .wscale import wscale_std, he_fan_in
from .losses import softmax_ce_with_ignore, weighted_softmax_ce
