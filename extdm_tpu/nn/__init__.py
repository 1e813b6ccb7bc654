from extdm_tpu.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Decoder,
    Dense,
    DownBlock2d,
    Encoder,
    Hourglass,
    ResBlock2d,
    SameBlock2d,
    UpBlock2d,
)

__all__ = [
    "BatchNorm",
    "Conv",
    "ConvTranspose",
    "Decoder",
    "Dense",
    "DownBlock2d",
    "Encoder",
    "Hourglass",
    "ResBlock2d",
    "SameBlock2d",
    "UpBlock2d",
]
