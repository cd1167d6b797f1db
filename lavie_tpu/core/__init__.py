from lavie_tpu.core.config import (
    UNetConfig,
    VAEConfig,
    CLIPTextConfig,
    SamplingConfig,
    load_yaml_config,
)
from lavie_tpu.core.mesh import make_mesh, shard_batch_frames

__all__ = [
    "UNetConfig",
    "VAEConfig",
    "CLIPTextConfig",
    "SamplingConfig",
    "load_yaml_config",
    "make_mesh",
    "shard_batch_frames",
]
