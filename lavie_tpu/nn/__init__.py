from lavie_tpu.nn.unet import UNet3D
from lavie_tpu.nn.transformer import Transformer3D, BasicTransformerBlock, FeedForward
from lavie_tpu.nn.attention import Attention, TemporalAttention, SparseCausalAttention
from lavie_tpu.nn.resnet import ResnetBlock3D, Upsample3D, Downsample3D

__all__ = [
    "UNet3D",
    "Transformer3D",
    "BasicTransformerBlock",
    "FeedForward",
    "Attention",
    "TemporalAttention",
    "SparseCausalAttention",
    "ResnetBlock3D",
    "Upsample3D",
    "Downsample3D",
]
