from megaportraits_tpu.ops.pallas.conv2d import fused_conv3x3
