from megaportraits_tpu.nn.layers import (
    TorchConv,
    TorchDense,
    WSConv,
    GroupNorm32,
    AdaptiveGroupNorm,
    InstanceNorm,
    torch_kaiming_uniform,
    torch_bias_uniform,
)
from megaportraits_tpu.nn.blocks import (
    ResBlockCustom,
    ResBlock2DAdaptive,
    ResBlock3DAdaptive,
    ResBlock3D,
    ResBlock2D,
    ResBlockBN,
    SPADE,
    SPADEResBlock,
)
