"""Generate a tiny PIPELINE-LEVEL parity golden from the reference side.

Exercises the full ≥35 dB PSNR machinery offline (VERDICT r2 #4): the torch
side runs the reference denoise loop — CFG latent doubling, per-step
`scheduler.step` through the reference's own vendored DDIM
(vsr/diffusion/scheduling_ddim.py `step`, the stock diffusers-0.16 body),
per-frame VAE decode ×1/0.18215 — over the reference's own tiny base UNet
(imported via tests/ref_shim from base/models/unet.py), with INJECTED initial
latents and text states, then dumps everything `tools/parity_harness.py
--tiny-golden` needs to replay the run through our TextToVideoPipeline and
report PSNR. Reference loop being mirrored:
base/pipelines/pipeline_videogen.py:503-506 (latent injection), :663-689
(denoise loop), :422-429 (decode_latents).

The real-checkpoint parity run is this flow with the tiny configs swapped
for the shipped ones (parity_harness.py --dump/--ckpt).

Round-4 extension (VERDICT r3 #6): --stage tsr/vsr dump the OTHER two
denoise loops the same way —
  tsr: the reference's own SpacedDiffusion.ddim_sample_loop over the
    reference tiny TSR UNet with copied-video concat conditioning
    (interpolation/sample.py:135-174, gaussian_diffusion.py:282-291);
  vsr: the reference upscale recipe — low-res DDPM noising at noise_level,
    v-pred DDIM with the vendored scheduler, noise-level class embedding
    (vsr/models/pipeline_stable_diffusion_upscale_video_3d.py:631-738) —
    mirrored at tiny width with file:line citations, over the reference
    UNet3DVSRModel.

Usage: python tools/dump_pipeline_golden.py [--stage base|tsr|vsr|all] [out.npz]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

# pipeline recipe (reference surface: base/configs/sample.yaml:23-40, tiny'd)
STEPS = 10
GUIDANCE = 7.5
FRAMES, HEIGHT, WIDTH = 3, 64, 64
CTX_LEN, CTX_DIM = 7, 24
SCALING = 0.18215

# heads=1 keeps head_dim=32: the reference's shared RotaryEmbedding(32)
# cannot rotate heads narrower than 32 (base/models/unet.py:185)
UNET_CFG = dict(
    block_out_channels=(32, 32, 32, 32), layers_per_block=1,
    num_attention_heads=1, norm_num_groups=8, cross_attention_dim=CTX_DIM,
    rope_dim=32,
)
VAE_CFG = dict(
    block_out_channels=(16, 16, 16, 16), layers_per_block=1,
    norm_num_groups=4, scaling_factor=SCALING,
)


def _fp16_grid(*mods) -> None:
    """Round weights to the fp16 grid BEFORE the run (repo golden convention:
    state_dict fp16, math fp32 — both frameworks then compute from IDENTICAL
    weights, so storage costs no parity)."""
    import torch

    with torch.no_grad():
        for mod in mods:
            for p in mod.parameters():
                p.copy_(p.half().float())
            for b in mod.buffers():
                if b.is_floating_point():
                    b.copy_(b.half().float())


def main(out_path: str = "tests/golden/pipeline_base.npz", *,
         steps: int = STEPS, guidance: float = GUIDANCE,
         frames: int = FRAMES, height: int = HEIGHT, width: int = WIDTH,
         ctx_len: int = CTX_LEN, ctx_dim: int = CTX_DIM,
         unet_cfg: dict = UNET_CFG, vae_cfg: dict = VAE_CFG,
         compress: bool = True) -> str:
    """Dump the base-pipeline golden. Defaults reproduce the committed tiny
    golden; tests/test_fullwidth_loop.py calls this with the PRODUCTION
    widths (909M UNet / SD f8 VAE) and tiny spatial/step counts, writing to
    a temp dir (compress=False: savez_compressed on ~2 GB of fp16 weights is
    minutes of CPU) — full-width loop-level parity without committing
    GB-scale goldens (VERDICT r4 #4)."""
    import torch

    import ref_shim
    from test_ref_parity import randomize_zero_weights
    from test_torch_parity import TestVAEParity

    ref_unet_mod = ref_shim.load_ref("base", "unet")
    sched_mod = ref_shim.load_ref("vsr_diffusion", "scheduling_ddim")

    torch.manual_seed(60)
    unet_t = ref_unet_mod.UNet3DConditionModel(
        in_channels=4, out_channels=4,
        block_out_channels=unet_cfg["block_out_channels"],
        layers_per_block=unet_cfg["layers_per_block"],
        norm_num_groups=unet_cfg["norm_num_groups"],
        cross_attention_dim=ctx_dim,
        attention_head_dim=unet_cfg["num_attention_heads"],
    ).eval()
    randomize_zero_weights(unet_t, seed=61)

    torch.manual_seed(62)
    vae_t = TestVAEParity._torch_vae(
        boc=vae_cfg["block_out_channels"],
        layers=vae_cfg["layers_per_block"],
        groups=vae_cfg["norm_num_groups"], latent=4,
    ).eval()

    _fp16_grid(unet_t, vae_t)

    # the shipped base scheduler: diffusers DDIM from the SD-1.4 config —
    # linear β, clip_sample=True (diffusers default; the config has no key),
    # set_alpha_to_one=False, steps_offset=1 (base/pipelines/sample.py:44-60).
    # The vendored class's `step` is the stock diffusers body; only its
    # set_timesteps is the dead linspace variant, so the stock arange spacing
    # is applied here (proven equal to our ddim_timesteps below).
    sch = sched_mod.DDIMScheduler(
        num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
        beta_schedule="linear", clip_sample=True, set_alpha_to_one=False,
        steps_offset=1, prediction_type="epsilon",
    )
    sch.num_inference_steps = steps
    ratio = 1000 // steps
    ts = (np.arange(0, steps) * ratio).round()[::-1].astype(np.int64) + 1
    sch.timesteps = torch.from_numpy(ts)

    g = torch.Generator().manual_seed(63)
    lat_h, lat_w = height // 8, width // 8
    latents0 = torch.randn(1, 4, frames, lat_h, lat_w, generator=g)
    text_states = torch.randn(2, ctx_len, ctx_dim, generator=g)  # [uncond; cond]

    # --- reference denoise loop (pipeline_videogen.py:663-689) ---
    x = latents0.clone()  # DDIM init_noise_sigma = 1
    with torch.no_grad():
        for t in ts:
            xin = torch.cat([x, x], dim=0)
            t_b = torch.full((2,), int(t), dtype=torch.long)
            pred = unet_t(xin, t_b, encoder_hidden_states=text_states).sample
            uncond, cond = pred.chunk(2, dim=0)
            eps = uncond + guidance * (cond - uncond)
            x = sch.step(eps, int(t), x).prev_sample

        # --- decode_latents (:422-429): ×1/scaling, per-frame VAE decode ---
        frames_rgb = []
        for fi in range(frames):
            z = x[:, :, fi] / SCALING  # (1, 4, lat_h, lat_w)
            frames_rgb.append(vae_t.decode(z))
        video = torch.stack(frames_rgb, dim=1)  # (1, F, 3, H, W)
    video = video.permute(0, 1, 3, 4, 2).numpy()  # (1, F, H, W, 3)
    video_u8 = np.round(np.clip(video / 2.0 + 0.5, 0.0, 1.0) * 255.0).astype(np.uint8)

    arrays = {
        "latents": latents0.numpy(),  # (1, 4, F, h, w) reference BCFHW layout
        "text_states": text_states.numpy(),
        "video": video_u8,
        "final_latents": x.numpy(),
    }
    for k, v in unet_t.state_dict().items():
        arrays[f"unet::{k}"] = v.half().numpy()  # fp16 storage (values are
    for k, v in vae_t.state_dict().items():      # already on the fp16 grid)
        arrays[f"vae::{k}"] = v.half().numpy()
    arrays["meta"] = np.array(json.dumps(dict(
        steps=steps, guidance=guidance, unet=unet_cfg,
        vae=vae_cfg, frames=frames, height=height, width=width,
    )))
    save = np.savez_compressed if compress else np.savez
    save(out_path, **{
        k: (np.asarray(v) if not isinstance(v, np.ndarray) else v)
        for k, v in arrays.items()
    })
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB)")
    return out_path


# ---------------------------------------------------------------------------
# TSR pipeline golden — the reference's own vendored SpacedDiffusion DDIM
# loop with copied-video concat conditioning (interpolation/sample.py:135-174)
# ---------------------------------------------------------------------------

TSR_STEPS = 10
TSR_GUIDANCE = 4.0  # forward_with_cfg default (interpolation/models/unet.py:458)
TSR_FRAMES = 61  # the copied-video recipe is 61-specific (range(0,62,4))
TSR_HW = 64

# our-side config kwargs (UNetConfig), mirrored by the torch ctor below
TSR_UNET_CFG = dict(
    in_channels=8, block_out_channels=(64, 64, 64, 64), layers_per_block=1,
    num_attention_heads=2, norm_num_groups=8, cross_attention_dim=CTX_DIM,
    spatial_attention="sparse_causal", temporal_attention="plain",
    ff_before_temporal=True,
)


def dump_tsr(out_path: str = "tests/golden/pipeline_tsr.npz", *,
             steps: int = TSR_STEPS, hw: int = TSR_HW,
             ctx_len: int = CTX_LEN, ctx_dim: int = CTX_DIM,
             unet_cfg: dict = TSR_UNET_CFG, vae_cfg: dict = VAE_CFG,
             compress: bool = True) -> str:
    """Dump the TSR pipeline golden (61 frames — the copied-video recipe is
    61-specific). Defaults reproduce the committed tiny golden;
    tests/test_fullwidth_loop.py calls this at production widths."""
    import torch

    import ref_shim
    from test_ref_parity import randomize_zero_weights
    from test_torch_parity import TestVAEParity

    ref_unet_mod = ref_shim.load_ref("interpolation", "unet")
    gd = ref_shim.load_ref("interpolation_diffusion", "gaussian_diffusion")
    respace = ref_shim.load_ref("interpolation_diffusion", "respace")

    torch.manual_seed(70)
    unet_t = ref_unet_mod.UNet3DConditionModel(
        in_channels=8, out_channels=4,
        block_out_channels=unet_cfg["block_out_channels"],
        layers_per_block=unet_cfg["layers_per_block"],
        norm_num_groups=unet_cfg["norm_num_groups"],
        cross_attention_dim=ctx_dim,
        attention_head_dim=unet_cfg["num_attention_heads"],
        use_first_frame=True,
    ).eval()
    randomize_zero_weights(unet_t, seed=71)
    torch.manual_seed(72)
    vae_t = TestVAEParity._torch_vae(
        boc=vae_cfg["block_out_channels"],
        layers=vae_cfg["layers_per_block"],
        groups=vae_cfg["norm_num_groups"], latent=4,
    ).eval()
    _fp16_grid(unet_t, vae_t)

    # the shipped TSR diffusion: create_diffusion(str(steps)) →
    # SpacedDiffusion(ε-pred, FIXED_LARGE, linear β over 1000 steps)
    # (interpolation/diffusion/__init__.py:10-47)
    diffusion = respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(1000, str(steps)),
        betas=gd.get_named_beta_schedule("linear", 1000),
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_LARGE,
        loss_type=gd.LossType.MSE,
    )

    g = torch.Generator().manual_seed(73)
    lat_hw = hw // 8
    # 61 input frames in [-1, 1] (reference get_input reads 61 frames via
    # linspace + Normalize(0.5, 0.5), interpolation/sample.py:73-81)
    video_in = torch.rand(TSR_FRAMES, 3, hw, hw, generator=g) * 2 - 1
    video_in = (video_in.half().float())  # fp16 grid like the weights

    with torch.no_grad():
        # VAE-encode ALL 61 frames, posterior-sampled with recorded ε
        # (reference: latent_dist.sample().mul_(0.18215), sample.py:141-143)
        moments = vae_t.encode_moments(video_in)
        mean, logvar = torch.chunk(moments, 2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        eps_enc = torch.randn(mean.shape, generator=g)
        z_lat = (mean + torch.exp(0.5 * logvar) * eps_enc) * SCALING
        video_lat = z_lat.permute(1, 0, 2, 3)[None]  # (1, 4, 61, h, w)

        # copied-video conditioning (sample.py:145-148)
        lr_indice = torch.arange(0, 62, 4, dtype=torch.long)
        copied = torch.index_select(video_lat, 2, lr_indice)
        copied = torch.repeat_interleave(copied, 4, dim=2)[:, :, 1:-2]
        copied2 = torch.cat([copied] * 2)

        z0 = torch.randn(1, 4, TSR_FRAMES, lat_hw, lat_hw, generator=g)
        z2 = torch.cat([z0] * 2)
        text_uncond = torch.randn(1, ctx_len, ctx_dim, generator=g)
        text_cond = torch.randn(1, ctx_len, ctx_dim, generator=g)
        # reference text order: [prompt, negative] (sample.py:156-158;
        # forward_with_cfg splits cond first, unet.py:470-473)
        text_prompt = torch.cat([text_cond, text_uncond])
        model_kwargs = dict(
            encoder_hidden_states=text_prompt, class_labels=None,
            cfg_scale=TSR_GUIDANCE,
        )
        samples = diffusion.ddim_sample_loop(
            unet_t.forward_with_cfg, z2.shape, z2, clip_denoised=False,
            model_kwargs=model_kwargs, progress=False, mask=None,
            device=torch.device("cpu"),
            x_start=copied2, use_concat=True, copy_no_mask=True,
        )
        samples, _ = samples.chunk(2, dim=0)
        dec = vae_t.decode(samples[0].permute(1, 0, 2, 3) / SCALING)
    video = dec[None].permute(0, 1, 3, 4, 2).numpy()  # (1, 61, H, W, 3)
    video_u8 = np.round(np.clip(video / 2.0 + 0.5, 0.0, 1.0) * 255.0).astype(np.uint8)

    arrays = {
        "video_in": video_in.numpy(),     # (61, 3, H, W) float [-1,1]
        "latents": z0.numpy(),            # (1, 4, 61, h, w)
        "enc_noise": eps_enc.numpy(),     # (61, 4, h, w) posterior ε, all frames
        "text_states": torch.cat([text_uncond, text_cond]).numpy(),  # OUR order
        "video": video_u8,
        "final_latents": samples.numpy(),
    }
    for k, v in unet_t.state_dict().items():
        arrays[f"unet::{k}"] = v.half().numpy()
    for k, v in vae_t.state_dict().items():
        arrays[f"vae::{k}"] = v.half().numpy()
    arrays["meta"] = np.array(json.dumps(dict(
        steps=steps, guidance=TSR_GUIDANCE, unet=unet_cfg,
        vae=vae_cfg, frames=TSR_FRAMES, height=hw, width=hw,
    )))
    save = np.savez_compressed if compress else np.savez
    save(out_path, **arrays)
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB)")
    return out_path


# ---------------------------------------------------------------------------
# VSR pipeline golden — low-res DDPM noising at noise_level, v-pred DDIM,
# noise-level class embedding (…3d.py:631-738), f4 VAE decode
# ---------------------------------------------------------------------------

VSR_STEPS = 10
VSR_GUIDANCE = 5.0  # vsr/configs/sample.yaml guidance_scale
VSR_NOISE_LEVEL = 50
VSR_FRAMES = 3
VSR_HW = 32  # low-res input = latent resolution; f4 VAE decodes ×4
VSR_SCALING = 0.08333

# our-side config kwargs (UNetConfig), mirrored by the torch ctor below —
# the tiny shape proven by tests/test_ref_parity.py::test_vsr_unet
VSR_UNET_CFG = dict(
    in_channels=7, block_out_channels=(32, 32, 32, 64),
    down_block_types=(
        "DownBlock3D", "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
    ),
    up_block_types=(
        "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D", "UpBlock3D",
    ),
    layers_per_block=1, num_attention_heads=1, norm_num_groups=32,
    cross_attention_dim=CTX_DIM,
    only_cross_attention=(True, True, True, False),
    use_linear_projection=True, class_embed_type="num_embeds",
    num_class_embeds=100, use_temporal_modules=True,
    transformer_temporal_resblock=True, rope_dim=32,
)
VSR_VAE_CFG = dict(
    block_out_channels=(16, 16, 16), layers_per_block=1,
    norm_num_groups=4, scaling_factor=VSR_SCALING,
)


def dump_vsr(out_path: str = "tests/golden/pipeline_vsr.npz", *,
             steps: int = VSR_STEPS, frames: int = VSR_FRAMES,
             hw: int = VSR_HW, ctx_len: int = CTX_LEN, ctx_dim: int = CTX_DIM,
             unet_cfg: dict = VSR_UNET_CFG, vae_cfg: dict = VSR_VAE_CFG,
             compress: bool = True) -> str:
    """Dump the VSR pipeline golden. Defaults reproduce the committed tiny
    golden; tests/test_fullwidth_loop.py calls this at the SHIPPED widths
    (256/512/512/1024 UNet, f4 VAE) with tiny spatial/steps (VERDICT r4 #4)."""
    import torch

    import ref_shim
    from test_ref_parity import randomize_zero_weights
    from test_torch_parity import TestVAEParity

    ref_unet_mod = ref_shim.load_ref("vsr", "unet")
    sched_mod = ref_shim.load_ref("vsr_diffusion", "scheduling_ddim")

    torch.manual_seed(80)
    unet_t = ref_unet_mod.UNet3DVSRModel(
        down_temporal_idx=(0, 1, 2, 3), mid_temporal=True,
        up_temporal_idx=(0, 1, 2, 3), video_condition=False,
        temporal_module_config=dict(
            num_attention_layers=1, attention_block_types=("", ""),
            cross_frame_attention_mode="0_i-1_i",
            temporal_shift_fold_div=2, temporal_shift_direction="right",
            use_dcn_warpping=False, use_deformable_conv=False,
            attention_dim_div=2,
        ),
        in_channels=7, out_channels=4,
        block_out_channels=unet_cfg["block_out_channels"],
        layers_per_block=unet_cfg["layers_per_block"],
        norm_num_groups=unet_cfg["norm_num_groups"],
        cross_attention_dim=ctx_dim,
        attention_head_dim=unet_cfg["num_attention_heads"],
        num_class_embeds=unet_cfg["num_class_embeds"],
        down_block_types=unet_cfg["down_block_types"],
        up_block_types=unet_cfg["up_block_types"],
        only_cross_attention=unet_cfg["only_cross_attention"],
        use_linear_projection=unet_cfg["use_linear_projection"],
    ).eval()
    randomize_zero_weights(unet_t, seed=81)
    torch.manual_seed(82)
    vae_t = TestVAEParity._torch_vae(
        boc=vae_cfg["block_out_channels"],
        layers=vae_cfg["layers_per_block"],
        groups=vae_cfg["norm_num_groups"], latent=4,
    ).eval()
    _fp16_grid(unet_t, vae_t)

    # main scheduler: the x4-upscaler DDIM config with β overridden to linear
    # (vsr/sample.py:49-53) — v-prediction, clip_sample=false,
    # set_alpha_to_one=false, steps_offset=1, stock arange spacing
    sch = sched_mod.DDIMScheduler(
        num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
        beta_schedule="linear", clip_sample=False, set_alpha_to_one=False,
        steps_offset=1, prediction_type="v_prediction",
    )
    sch.num_inference_steps = steps
    ratio = 1000 // steps
    ts = (np.arange(0, steps) * ratio).round()[::-1].astype(np.int64) + 1
    sch.timesteps = torch.from_numpy(ts)

    # low-res augmentation schedule: the x4-upscaler low_res_scheduler's
    # squared-sqrt-linspace β (vsr/models/upscaling.py:21-25); the reference
    # never overrides it (…3d.py:631-634)
    betas_lr = np.linspace(1e-4 ** 0.5, 2e-2 ** 0.5, 1000, dtype=np.float64) ** 2
    acp_lr = np.cumprod(1.0 - betas_lr)

    g = torch.Generator().manual_seed(83)
    frames_in = torch.rand(1, 3, frames, hw, hw, generator=g) * 2 - 1
    frames_in = frames_in.half().float()  # fp16 grid like the weights
    eps_lr = torch.randn(frames_in.shape, generator=g)
    nl = VSR_NOISE_LEVEL
    image = (
        float(np.sqrt(acp_lr[nl])) * frames_in
        + float(np.sqrt(1.0 - acp_lr[nl])) * eps_lr
    )

    z0 = torch.randn(1, 4, frames, hw, hw, generator=g)
    text_uncond = torch.randn(1, ctx_len, ctx_dim, generator=g)
    text_cond = torch.randn(1, ctx_len, ctx_dim, generator=g)
    text_states = torch.cat([text_uncond, text_cond])  # diffusers CFG order

    # --- reference denoise loop (…3d.py:709-738): CFG-doubled image +
    # noise_level, per-step low-res concat inside the UNet (unet.py:453),
    # v-pred DDIM step ---
    x = z0.clone()
    img2 = torch.cat([image, image])
    nl2 = torch.full((2,), nl, dtype=torch.long)
    with torch.no_grad():
        for t in ts:
            lat2 = torch.cat([x, x])
            t_b = torch.full((2,), int(t), dtype=torch.long)
            pred = unet_t(
                lat2, t_b, low_res=img2, encoder_hidden_states=text_states,
                class_labels=nl2,
            ).sample
            u, c = pred.chunk(2, dim=0)
            v = u + VSR_GUIDANCE * (c - u)
            x = sch.step(v, int(t), x).prev_sample

        # --- f4 VAE decode (…3d.py:741-771; latents at input res, decoder
        # does the ×4) ---
        dec = vae_t.decode(x[0].permute(1, 0, 2, 3) / VSR_SCALING)  # (F,3,4H,4W)
    video = dec[None].permute(0, 1, 3, 4, 2).numpy()
    video = np.clip(video, -1.0, 1.0)
    video_u8 = np.round(np.clip(video / 2.0 + 0.5, 0.0, 1.0) * 255.0).astype(np.uint8)

    arrays = {
        "frames_in": frames_in.numpy(),  # (1, 3, F, H, W) float [-1,1]
        "latents": z0.numpy(),           # (1, 4, F, H, W)
        "lr_noise": eps_lr.numpy(),      # (1, 3, F, H, W)
        "text_states": text_states.numpy(),
        "video": video_u8,               # (1, F, 4H, 4W, 3)
        "final_latents": x.numpy(),
    }
    for k, v in unet_t.state_dict().items():
        arrays[f"unet::{k}"] = v.half().numpy()
    for k, v in vae_t.state_dict().items():
        arrays[f"vae::{k}"] = v.half().numpy()
    arrays["meta"] = np.array(json.dumps(dict(
        steps=steps, guidance=VSR_GUIDANCE, noise_level=nl,
        unet=unet_cfg, vae=vae_cfg, frames=frames,
        height=hw, width=hw,
    )))
    save = np.savez_compressed if compress else np.savez
    save(out_path, **arrays)
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB)")
    return out_path


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    stage = "base"
    if args and args[0] == "--stage":
        stage = args[1]
        args = args[2:]
    dumps = {"base": main, "tsr": dump_tsr, "vsr": dump_vsr}
    if stage == "all":
        for fn in dumps.values():
            fn()
    else:
        dumps[stage](*args)
