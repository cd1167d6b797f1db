"""Full-width LOOP-level parity (VERDICT r4 #4).

The parity pyramid had two layers — full-width per-forward parity
(test_ref_parity.py::TestFullWidthUNetForwardParity) and tiny-width
loop-level goldens (test_golden.py pipeline PSNRs) — but nothing composed
them: the 50-step feedback loop had never been parity-checked at production
CHANNEL width. A full-width loop bug (a dtype cast that only matters at
1280 channels, an fp32 boundary tiny configs don't stress) would pass every
other test.

These tests drive the reference torch pipeline at PRODUCTION width (909M
base UNet with 320/640/1280/1280 channels + the SD f8 VAE; the VSR variant
at its shipped 256/512/512/1024 widths) for 2 DDIM steps on CPU with
injected latents/text states, then replay the identical run through our
pipeline and assert >= 35 dB end-to-end PSNR. Spatial dims and step count
stay tiny (one CPU core); the CHANNEL math is exactly checkpoint-shaped.
Goldens are generated in-session into tmp_path — nothing GB-scale is
committed. Reference loop: base/pipelines/pipeline_videogen.py:663-689;
VSR: vsr/models/pipeline_stable_diffusion_upscale_video_3d.py:631-738.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))

# production widths (base/models/unet.py defaults; vsr/configs/unet_3d_config.json)
FULL_BASE_UNET = dict(
    block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
    num_attention_heads=8, norm_num_groups=32, cross_attention_dim=768,
    rope_dim=32,
)
FULL_SD_VAE = dict(
    block_out_channels=(128, 256, 512, 512), layers_per_block=2,
    norm_num_groups=32, scaling_factor=0.18215,
)


FULL_TSR_UNET = dict(
    in_channels=8, block_out_channels=(320, 640, 1280, 1280),
    layers_per_block=2, num_attention_heads=8, norm_num_groups=32,
    cross_attention_dim=768, spatial_attention="sparse_causal",
    temporal_attention="plain", ff_before_temporal=True,
)


def test_fullwidth_tsr_loop_psnr(tmp_path):
    """The TSR production widths (8-ch 320/640/1280/1280 UNet, SparseCausal
    attn1, plain temporal, ff-before-temporal) through the reference's own
    SpacedDiffusion DDIM loop with copied-video concat conditioning (61
    frames — the recipe is 61-specific — at 64x64, 2 steps) vs our
    VideoInterpolationPipeline — >= 35 dB."""
    import dump_pipeline_golden as dpg
    from parity_harness import run_tiny_golden_tsr

    path = str(tmp_path / "pipeline_tsr_fullwidth.npz")
    dpg.dump_tsr(
        path, steps=2, hw=64, ctx_len=77, ctx_dim=768,
        unet_cfg=FULL_TSR_UNET, vae_cfg=FULL_SD_VAE,
        compress=False,
    )
    psnr = run_tiny_golden_tsr(path)
    assert psnr >= 35.0, f"full-width TSR loop PSNR {psnr:.2f} < 35 dB"


FULL_VSR_UNET = dict(
    in_channels=7, block_out_channels=(256, 512, 512, 1024),
    down_block_types=(
        "DownBlock3D", "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
    ),
    up_block_types=(
        "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D", "UpBlock3D",
    ),
    layers_per_block=2, num_attention_heads=8, norm_num_groups=32,
    cross_attention_dim=1024,
    only_cross_attention=(True, True, True, False),
    use_linear_projection=True, class_embed_type="num_embeds",
    num_class_embeds=1000, use_temporal_modules=True,
    transformer_temporal_resblock=True, rope_dim=32,
)
FULL_VSR_VAE = dict(
    block_out_channels=(128, 256, 512), layers_per_block=2,
    norm_num_groups=32, scaling_factor=0.08333,
)


def test_fullwidth_vsr_loop_psnr(tmp_path):
    """The shipped VSR widths (256/512/512/1024 UNet + f4 VAE) through the
    reference v-pred upscale loop — low-res DDPM noising at noise_level,
    noise-level class embedding, v-pred DDIM (2 steps, 2 frames, 32x32
    low-res) vs our VideoSuperResolutionPipeline — >= 35 dB."""
    import dump_pipeline_golden as dpg
    from parity_harness import run_tiny_golden_vsr

    path = str(tmp_path / "pipeline_vsr_fullwidth.npz")
    dpg.dump_vsr(
        path, steps=2, frames=2, hw=32, ctx_len=77, ctx_dim=1024,
        unet_cfg=FULL_VSR_UNET, vae_cfg=FULL_VSR_VAE,
        compress=False,
    )
    psnr = run_tiny_golden_vsr(path)
    assert psnr >= 35.0, f"full-width VSR loop PSNR {psnr:.2f} < 35 dB"


def test_fullwidth_base_loop_psnr(tmp_path):
    """909M UNet + SD f8 VAE through the reference DDIM loop (2 steps,
    2 frames, 256x256) vs our TextToVideoPipeline — >= 35 dB."""
    import dump_pipeline_golden as dpg
    from parity_harness import run_tiny_golden

    path = str(tmp_path / "pipeline_base_fullwidth.npz")
    dpg.main(
        path, steps=2, frames=2, height=256, width=256,
        ctx_len=77, ctx_dim=768,
        unet_cfg=FULL_BASE_UNET, vae_cfg=FULL_SD_VAE,
        compress=False,
    )
    psnr = run_tiny_golden(path)
    assert psnr >= 35.0, f"full-width base loop PSNR {psnr:.2f} < 35 dB"
