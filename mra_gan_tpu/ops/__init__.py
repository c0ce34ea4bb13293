from .conv import conv3d, conv_transpose3d, replication_pad3d
from .norm import instance_norm, instance_norm_act
from .losses import gan_loss, l1_loss, cor_coe_loss
from .init import get_initializer
