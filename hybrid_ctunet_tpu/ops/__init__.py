from .conv import conv3d_same, conv_transpose3d_same, same_padding, transpose_output_padding
from .norm import instance_norm, layer_norm
from .act import leaky_relu
from .losses import dice_ce_loss, dice_loss, softmax_cross_entropy
from .resize import zoom_nearest, downscale_labels
from .importance import gaussian_importance_map
