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

Usage: python tools/dump_pipeline_golden.py [out.npz]
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


def main(out_path: str = "tests/golden/pipeline_base.npz") -> str:
    import torch

    import ref_shim
    from test_ref_parity import randomize_zero_weights
    from test_torch_parity import TestVAEParity

    ref_unet_mod = ref_shim.load_ref("base", "unet")
    sched_mod = ref_shim.load_ref("vsr_diffusion", "scheduling_ddim")

    torch.manual_seed(60)
    unet_t = ref_unet_mod.UNet3DConditionModel(
        in_channels=4, out_channels=4,
        block_out_channels=UNET_CFG["block_out_channels"],
        layers_per_block=UNET_CFG["layers_per_block"],
        norm_num_groups=UNET_CFG["norm_num_groups"],
        cross_attention_dim=CTX_DIM,
        attention_head_dim=UNET_CFG["num_attention_heads"],
    ).eval()
    randomize_zero_weights(unet_t, seed=61)

    torch.manual_seed(62)
    vae_t = TestVAEParity._torch_vae(
        boc=VAE_CFG["block_out_channels"],
        layers=VAE_CFG["layers_per_block"],
        groups=VAE_CFG["norm_num_groups"], latent=4,
    ).eval()

    # round weights to the fp16 grid BEFORE the run (repo golden convention:
    # state_dict fp16, math fp32 — both frameworks then compute from
    # IDENTICAL weights, so storage costs no parity)
    with torch.no_grad():
        for mod in (unet_t, vae_t):
            for p in mod.parameters():
                p.copy_(p.half().float())
            for b in mod.buffers():
                if b.is_floating_point():
                    b.copy_(b.half().float())

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
    sch.num_inference_steps = STEPS
    ratio = 1000 // STEPS
    ts = (np.arange(0, STEPS) * ratio).round()[::-1].astype(np.int64) + 1
    sch.timesteps = torch.from_numpy(ts)

    g = torch.Generator().manual_seed(63)
    lat_h, lat_w = HEIGHT // 8, WIDTH // 8
    latents0 = torch.randn(1, 4, FRAMES, lat_h, lat_w, generator=g)
    text_states = torch.randn(2, CTX_LEN, CTX_DIM, generator=g)  # [uncond; cond]

    # --- reference denoise loop (pipeline_videogen.py:663-689) ---
    x = latents0.clone()  # DDIM init_noise_sigma = 1
    with torch.no_grad():
        for t in ts:
            xin = torch.cat([x, x], dim=0)
            t_b = torch.full((2,), int(t), dtype=torch.long)
            pred = unet_t(xin, t_b, encoder_hidden_states=text_states).sample
            uncond, cond = pred.chunk(2, dim=0)
            eps = uncond + GUIDANCE * (cond - uncond)
            x = sch.step(eps, int(t), x).prev_sample

        # --- decode_latents (:422-429): ×1/scaling, per-frame VAE decode ---
        frames_rgb = []
        for fi in range(FRAMES):
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
        steps=STEPS, guidance=GUIDANCE, unet=UNET_CFG,
        vae=VAE_CFG, frames=FRAMES, height=HEIGHT, width=WIDTH,
    )))
    np.savez_compressed(out_path, **{
        k: (np.asarray(v) if not isinstance(v, np.ndarray) else v)
        for k, v in arrays.items()
    })
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB)")
    return out_path


if __name__ == "__main__":
    main(*sys.argv[1:])
