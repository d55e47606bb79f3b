from megaportraits_tpu.ops.pallas.fused_norm import (
    fused_adaptive_group_norm_relu,
)
