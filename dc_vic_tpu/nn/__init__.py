from .layers import (
    BetaScaleShift,
    BottleneckResBlock,
    ChengNLAM,
    Conv,
    DeconvTorch,
    DualBetaCondMLP,
    FuseSftBlock,
    GDN,
    GNResBlock,
    LightFuseSftBlock,
    NLAMResBlock,
    PixelShuffleUp,
    ResidualBottleneckBlocks,
    fourier_encode_beta,
    num_groups32,
    up_conv,
)
from .swin import RSTB, SwinBlock, WindowAttention
