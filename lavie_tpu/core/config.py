"""Configuration dataclasses for the lavie_tpu framework.

One `UNetConfig` parameterizes all three cascade stages of the reference
(base T2V, temporal interpolation, VSR) instead of three copy-pasted model
packages (reference: base/models/unet.py:101-295, interpolation/models/unet.py,
vsr/models/unet.py).

Public config surface mirrors the reference's OmegaConf YAML files
(reference: base/configs/sample.yaml, interpolation/configs/sample.yaml,
vsr/configs/sample.yaml).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Spatio-temporal UNet architecture.

    Defaults reproduce the base T2V model: SD-1.4 UNet inflated to video
    (reference: base/models/unet.py:101-295 and the SD-1.4 unet config.json).
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
    )
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # Number of attention heads per block. The reference inherits diffusers'
    # misnamed `attention_head_dim=8`, which for SD-1.4 actually means 8 heads
    # (reference: base/models/unet_blocks.py:289-291 divides channels by it).
    num_attention_heads: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    downsample_padding: int = 1
    mid_block_scale_factor: float = 1.0
    # Opt-in int8 turbo conv path ("none" | "int8", nn/quant.py). NOT the
    # parity path — quantization changes outputs; default off everywhere.
    conv_quant: str = "none"
    # Selective quantization: substring patterns matched against each conv's
    # flax module path; matching convs stay exact even in int8 mode (the
    # drift-vs-speed Pareto knob, tools/turbo_quality.py --sweep).
    conv_quant_exclude: Tuple[str, ...] = ()

    # --- spatio-temporal variants across the cascade ---
    # "self": plain spatial self-attention (base; reference attention.py:433-441)
    # "sparse_causal": k/v from frames {0, i-1} (interpolation;
    #   reference interpolation/models/attention.py:609-665)
    spatial_attention: str = "self"
    # "rope_relbias": RoPE(dim 32) on q/k + learned bucketed relative-position
    #   bias added to scores (base; reference attention.py:562-667)
    # "learned_relpos": BERT-style learned relative position embeddings in the
    #   score computation (interpolation; reference
    #   interpolation/models/attention.py:216-244)
    # "none": no temporal attention.
    temporal_attention: str = "rope_relbias"
    # The interpolation block applies FF BEFORE temporal attention
    # (reference: interpolation/models/attention.py:570-607); base/VSR after.
    ff_before_temporal: bool = False
    rope_dim: int = 32
    relpos_num_buckets: int = 32
    relpos_max_distance: int = 32

    # VSR-style variants
    only_cross_attention: Tuple[bool, ...] | bool = False
    use_linear_projection: bool = False
    # None | "num_embeds" (VSR learned noise-level embedding;
    # reference vsr/models/unet.py:179-186)
    class_embed_type: Optional[str] = None
    num_class_embeds: Optional[int] = None
    # Insert a TemporalModule3D (true 3D temporal convs) after every
    # down/mid/up block (VSR; reference vsr/models/temporal_module.py:65-178).
    use_temporal_modules: bool = False
    # VSR: every Transformer3D starts with a ResnetBlock3DCNN(kernel (3,1,1))
    # inside its residual (reference: vsr/models/attention.py:350, :396-399).
    transformer_temporal_resblock: bool = False
    temporal_module_kernels: Tuple[int, ...] = (5, 3)
    # optional VersatileSelfAttention branch inside each temporal module —
    # the shipped reference config disables it with ("", "")
    # (reference: vsr/configs/unet_3d_config.json:52-55)
    temporal_module_attention_types: Tuple[str, str] = ("", "")
    temporal_module_cross_frame_mode: str = "0_i-1_i"
    temporal_module_shift_fold_div: int = 2
    # WarpModule paths (reference: vsr/models/temporal_module.py:570-663);
    # the shipped config disables warping entirely (use_dcn_warpping: false)
    temporal_module_use_dcn_warpping: bool = False
    temporal_module_use_deformable_conv: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def only_cross_attention_per_block(self) -> Tuple[bool, ...]:
        oca = self.only_cross_attention
        if isinstance(oca, bool):
            return (oca,) * len(self.down_block_types)
        return tuple(oca)

    @classmethod
    def base_t2v(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def interpolation(cls, use_mask: bool = False) -> "UNetConfig":
        """TSR UNet: 8 input channels (4 noise + 4 copied-video latents), or 9
        with an extra mask channel (reference: interpolation/models/unet.py:503-508)."""
        return cls(
            in_channels=9 if use_mask else 8,
            spatial_attention="sparse_causal",
            ff_before_temporal=True,
            # the shipped TSR never enables use_relative_position — its
            # temporal attention is plain (reference:
            # interpolation/models/unet.py:100 default False; from_pretrained_2d
            # :477-558 doesn't set it; the 32-position learned-relpos table
            # couldn't index 61 frames anyway)
            temporal_attention="plain",
        )

    @classmethod
    def vsr(cls) -> "UNetConfig":
        """x4-upscaler UNet inflated to video: 7 input channels (4 latent +
        3 low-res RGB), noise-level class embedding, temporal modules after
        every block (reference: vsr/configs/unet_3d_config.json,
        vsr/models/unet.py:102-340)."""
        return cls(
            in_channels=7,
            block_out_channels=(256, 512, 512, 1024),
            down_block_types=(
                "DownBlock3D",
                "CrossAttnDownBlock3D",
                "CrossAttnDownBlock3D",
                "CrossAttnDownBlock3D",
            ),
            up_block_types=(
                "CrossAttnUpBlock3D",
                "CrossAttnUpBlock3D",
                "CrossAttnUpBlock3D",
                "UpBlock3D",
            ),
            cross_attention_dim=1024,
            only_cross_attention=(True, True, True, False),
            use_linear_projection=True,
            class_embed_type="num_embeds",
            num_class_embeds=1000,
            use_temporal_modules=True,
            transformer_temporal_resblock=True,
            spatial_attention="self",
            temporal_attention="rope_relbias",
        )

    def tiny(self, **overrides: Any) -> "UNetConfig":
        """A scaled-down config with the same topology, for tests."""
        small = dataclasses.replace(
            self,
            block_out_channels=tuple(32 for _ in self.block_out_channels),
            layers_per_block=1,
            num_attention_heads=2,
            norm_num_groups=8,
            # matches CLIPTextConfig.tiny().hidden_size so tiny pipelines wire up
            cross_attention_dim=32,
            rope_dim=4,
        )
        return dataclasses.replace(small, **overrides)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL. Defaults are the SD-1.4 f8 VAE; `vsr()` is the f4
    x4-upscaler VAE (reference: vsr/configs/vae_config.json)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    mid_block_attention: bool = True
    # opt-in int8 turbo convs (nn/quant.py) — NOT the parity path. Applies
    # to the wide 3×3 codec convs; conv_in/conv_out/1×1 stay exact.
    conv_quant: str = "none"
    # selective quantization (see UNetConfig.conv_quant_exclude)
    conv_quant_exclude: Tuple[str, ...] = ()

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def sd(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def vsr(cls) -> "VAEConfig":
        return cls(
            block_out_channels=(128, 256, 512),
            scaling_factor=0.08333,
        )

    def tiny(self) -> "VAEConfig":
        return dataclasses.replace(
            self,
            block_out_channels=tuple(16 for _ in self.block_out_channels),
            layers_per_block=1,
            norm_num_groups=4,
        )


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text encoder. Defaults are ViT-L/14 (SD-1.4 text encoder,
    reference: base/models/clip.py:32-58 wraps transformers CLIPTextModel)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    # HF config hidden_act: ViT-L towers use quick_gelu; the x4-upscaler's
    # OpenCLIP-H text encoder uses plain (erf) gelu
    hidden_act: str = "quick_gelu"
    # CLIP joint-embedding dimension (text_projection/visual_projection);
    # ViT-L/14: 768, ViT-B/32: 512. Used by the CLIPSIM scorer
    # (reference: base/pipelines/fine_tuning.py:860-892 scores with the
    # projection heads via the `clip` package).
    projection_dim: int = 768
    # OpenCLIP-H for the VSR stage text states (1024-d)
    @classmethod
    def vit_l(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def open_clip_h(cls) -> "CLIPTextConfig":
        return cls(
            hidden_size=1024,
            num_layers=23,
            num_heads=16,
            intermediate_size=4096,
            hidden_act="gelu",
        )

    def tiny(self) -> "CLIPTextConfig":
        return dataclasses.replace(
            self,
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            max_position_embeddings=16,
        )


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Sampling recipe. Defaults match the reference base stage
    (reference: base/configs/sample.yaml:23-40)."""

    video_length: int = 16
    height: int = 320
    width: int = 512
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    sample_method: str = "ddpm"  # ddpm | ddim | eulerdiscrete
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    num_train_timesteps: int = 1000
    steps_offset: int = 1
    prediction_type: str = "epsilon"  # epsilon | v_prediction
    eta: float = 0.0
    fps: int = 8
    # The reference builds DDPM/DDIM via from_pretrained on the SD-1.4
    # scheduler config (base/pipelines/sample.py:44-60): that config has no
    # clip_sample key, so diffusers' default clip_sample=True applies, and it
    # sets set_alpha_to_one=false (DDIM's terminal previous-alpha is ᾱ₀, not
    # 1). The VSR stage overrides both from the x4-upscaler config
    # (clip_sample=false there).
    clip_sample: bool = True
    set_alpha_to_one: bool = False


def load_yaml_config(path: str) -> dict:
    """Load an OmegaConf-style YAML config file (reference CLI surface:
    base/pipelines/sample.py:95-100)."""
    with open(path, "r") as f:
        return yaml.safe_load(f)
