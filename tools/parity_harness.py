"""Per-seed / per-module parity harness against the PyTorch reference.

The north-star parity metric is ≥35 dB PSNR on matched outputs
(BASELINE.md). Exact per-seed parity requires *injecting* the reference's
initial latents (torch and JAX RNGs differ; both pipelines accept `latents`,
reference: base/pipelines/pipeline_videogen.py:503-506).

Workflow (needs the reference checkpoints, which are not in this image):
  1. On the torch side, dump with `dump_reference.py`-style code:
       np.savez("ref_base.npz", latents=init_latents, video=out_video,
                text_emb=..., unet_in=..., unet_out=...)
  2. Run:  python tools/parity_harness.py --dump ref_base.npz \
               --ckpt pretrained_models/lavie_base.pt \
               --sd-path pretrained_models/stable-diffusion-v1-4
  3. Reports per-module activation diffs and end-to-end PSNR.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak**2 / mse))


def compare(name: str, ours: np.ndarray, ref: np.ndarray) -> None:
    ours = np.asarray(ours, np.float32)
    ref = np.asarray(ref, np.float32)
    if ours.shape != ref.shape:
        print(f"  {name}: SHAPE MISMATCH ours={ours.shape} ref={ref.shape}")
        return
    diff = np.abs(ours - ref)
    denom = np.abs(ref).mean() + 1e-8
    print(
        f"  {name}: max|Δ|={diff.max():.3e} mean|Δ|={diff.mean():.3e} "
        f"rel={diff.mean()/denom:.3e}"
    )


def run_tiny_golden(path: str) -> float:
    """Replay a pipeline-level golden produced by tools/dump_pipeline_golden
    (the reference's own tiny UNet + denoise loop + VAE decode with injected
    latents/text states) through our TextToVideoPipeline and return the
    end-to-end PSNR. This is the full ≥35 dB machinery — the real-checkpoint
    run is this flow with the shipped configs (reference loop mirrored:
    base/pipelines/pipeline_videogen.py:503-506, :663-689, :422-429)."""
    import json

    import jax
    import jax.numpy as jnp

    from lavie_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig
    from lavie_tpu.io.convert import convert_state_dict, permute_rope_channels
    from lavie_tpu.pipelines import TextToVideoPipeline

    dump = np.load(path, allow_pickle=False)
    meta = json.loads(str(dump["meta"]))
    unet_cfg = UNetConfig(**{
        k: tuple(v) if isinstance(v, list) else v for k, v in meta["unet"].items()
    })
    vae_cfg = VAEConfig(**{
        k: tuple(v) if isinstance(v, list) else v for k, v in meta["vae"].items()
    })

    pipe = TextToVideoPipeline.init_random(
        jax.random.PRNGKey(0), unet_config=unet_cfg, vae_config=vae_cfg,
        text_config=CLIPTextConfig.vit_l().tiny(),
        dtype=jnp.float32,  # the golden's torch side runs fp32
    )
    # weights stored fp16 (values on the fp16 grid — the torch run used the
    # same rounded values), math fp32
    unet_sd = {k[len("unet::"):]: dump[k].astype(np.float32)
               for k in dump.files if k.startswith("unet::")}
    vae_sd = {k[len("vae::"):]: dump[k].astype(np.float32)
              for k in dump.files if k.startswith("vae::")}
    unet_params = convert_state_dict(pipe.params["unet"], unet_sd, strict_unused=True)
    unet_params = permute_rope_channels(
        unet_params, heads=unet_cfg.num_attention_heads, rot_dim=unet_cfg.rope_dim
    )
    vae_params = convert_state_dict(pipe.params["vae"], vae_sd, strict_unused=True)
    pipe.params = dict(pipe.params, unet=unet_params, vae=vae_params)

    lat = np.transpose(dump["latents"], (0, 2, 3, 4, 1))  # BCFHW → BFHWC
    out = pipe(
        "", latents=lat, text_states=jnp.asarray(dump["text_states"]),
        num_inference_steps=int(meta["steps"]),
        guidance_scale=float(meta["guidance"]),
        sample_method="ddim",
    ).video
    ref_video = dump["video"]
    compare("pipeline.video(uint8)", out.astype(np.float32),
            ref_video.astype(np.float32))
    p = psnr(out, ref_video)
    print(f"end-to-end PSNR vs reference loop: {p:.2f} dB (target ≥ 35)")
    return p


def _cfgs_from_meta(meta):
    from lavie_tpu.core.config import UNetConfig, VAEConfig

    unet_cfg = UNetConfig(**{
        k: tuple(v) if isinstance(v, list) else v for k, v in meta["unet"].items()
    })
    vae_cfg = VAEConfig(**{
        k: tuple(v) if isinstance(v, list) else v for k, v in meta["vae"].items()
    })
    return unet_cfg, vae_cfg


def run_tiny_golden_tsr(path: str) -> float:
    """Replay the TSR pipeline-level golden (tools/dump_pipeline_golden.py
    --stage tsr: the reference's own SpacedDiffusion.ddim_sample_loop over
    the reference tiny TSR UNet with copied-video concat conditioning,
    interpolation/sample.py:135-174) through VideoInterpolationPipeline with
    injected latents / text states / VAE-posterior noise; returns PSNR."""
    import json

    import jax
    import jax.numpy as jnp

    from lavie_tpu.core.config import CLIPTextConfig
    from lavie_tpu.io.convert import convert_state_dict
    from lavie_tpu.pipelines.interpolate import (
        VideoInterpolationPipeline,
        copied_video_indices,
    )

    dump = np.load(path, allow_pickle=False)
    meta = json.loads(str(dump["meta"]))
    unet_cfg, vae_cfg = _cfgs_from_meta(meta)

    pipe = VideoInterpolationPipeline.init_random(
        jax.random.PRNGKey(0), unet_config=unet_cfg, vae_config=vae_cfg,
        text_config=CLIPTextConfig.vit_l().tiny(), dtype=jnp.float32,
    )
    unet_sd = {k[len("unet::"):]: dump[k].astype(np.float32)
               for k in dump.files if k.startswith("unet::")}
    vae_sd = {k[len("vae::"):]: dump[k].astype(np.float32)
              for k in dump.files if k.startswith("vae::")}
    pipe.params = dict(
        pipe.params,
        unet=convert_state_dict(pipe.params["unet"], unet_sd, strict_unused=True),
        vae=convert_state_dict(pipe.params["vae"], vae_sd, strict_unused=True),
    )

    video_in = dump["video_in"].transpose(0, 2, 3, 1)  # (61, H, W, 3) [-1,1]
    lat = np.transpose(dump["latents"], (0, 2, 3, 4, 1))  # BCFHW → BFHWC
    # the pipeline encodes only the copied-video KEY frames; slice the
    # reference's all-61-frame posterior ε at those slots
    key_slots = np.unique(copied_video_indices(int(meta["frames"])))
    enc_noise = dump["enc_noise"][key_slots].transpose(0, 2, 3, 1)

    out = pipe(
        video_in, latents=lat, text_states=dump["text_states"],
        encoder_noise=enc_noise, num_inference_steps=int(meta["steps"]),
        guidance_scale=float(meta["guidance"]), out_frames=int(meta["frames"]),
    ).video
    compare("tsr_pipeline.video(uint8)", out.astype(np.float32),
            dump["video"].astype(np.float32))
    p = psnr(out, dump["video"])
    print(f"TSR end-to-end PSNR vs reference loop: {p:.2f} dB (target ≥ 35)")
    return p


def run_tiny_golden_vsr(path: str) -> float:
    """Replay the VSR pipeline-level golden (tools/dump_pipeline_golden.py
    --stage vsr: low-res DDPM noising at noise_level + v-pred DDIM +
    noise-level class embedding over the reference UNet3DVSRModel,
    …3d.py:631-738) through VideoSuperResolutionPipeline with injected
    latents / text states / low-res noise; returns PSNR."""
    import json

    import jax
    import jax.numpy as jnp

    from lavie_tpu.core.config import CLIPTextConfig
    from lavie_tpu.io.convert import convert_state_dict, permute_rope_channels
    from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline

    dump = np.load(path, allow_pickle=False)
    meta = json.loads(str(dump["meta"]))
    unet_cfg, vae_cfg = _cfgs_from_meta(meta)

    pipe = VideoSuperResolutionPipeline.init_random(
        jax.random.PRNGKey(0), unet_config=unet_cfg, vae_config=vae_cfg,
        text_config=CLIPTextConfig.open_clip_h().tiny(), dtype=jnp.float32,
        window=int(meta["frames"]), noise_level=int(meta["noise_level"]),
    )
    unet_sd = {k[len("unet::"):]: dump[k].astype(np.float32)
               for k in dump.files if k.startswith("unet::")}
    vae_sd = {k[len("vae::"):]: dump[k].astype(np.float32)
              for k in dump.files if k.startswith("vae::")}
    unet_params = convert_state_dict(pipe.params["unet"], unet_sd, strict_unused=True)
    unet_params = permute_rope_channels(
        unet_params, heads=unet_cfg.num_attention_heads, rot_dim=unet_cfg.rope_dim
    )
    pipe.params = dict(
        pipe.params, unet=unet_params,
        vae=convert_state_dict(pipe.params["vae"], vae_sd, strict_unused=True),
    )

    frames_in = dump["frames_in"][0].transpose(1, 2, 3, 0)  # (F, H, W, 3)
    lat = np.transpose(dump["latents"], (0, 2, 3, 4, 1))
    lr_noise = np.transpose(dump["lr_noise"], (0, 2, 3, 4, 1))
    out = pipe(
        frames_in, text_states=dump["text_states"], latents=lat,
        lr_noise=lr_noise, num_inference_steps=int(meta["steps"]),
        guidance_scale=float(meta["guidance"]),
        noise_level=int(meta["noise_level"]),
    ).video
    ref_video = dump["video"][0]
    compare("vsr_pipeline.video(uint8)", out.astype(np.float32),
            ref_video.astype(np.float32))
    p = psnr(out, ref_video)
    print(f"VSR end-to-end PSNR vs reference loop: {p:.2f} dB (target ≥ 35)")
    return p


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dump", help=".npz of reference tensors")
    p.add_argument("--tiny-golden", help="pipeline-level golden npz "
                   "(tools/dump_pipeline_golden.py) — self-contained replay")
    p.add_argument("--ckpt", help="lavie_base.pt for weight conversion")
    p.add_argument("--sd-path", help="stable-diffusion-v1-4 folder")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon sitecustomize pins "
                        "the TPU programmatically, so the env var alone is "
                        "not enough)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.tiny_golden:
        base = os.path.basename(args.tiny_golden)
        if "tsr" in base:
            return run_tiny_golden_tsr(args.tiny_golden)
        if "vsr" in base:
            return run_tiny_golden_vsr(args.tiny_golden)
        return run_tiny_golden(args.tiny_golden)
    if not args.dump:
        raise SystemExit("one of --dump / --tiny-golden is required")

    import jax
    import jax.numpy as jnp

    from lavie_tpu.core.config import CLIPTextConfig, SamplingConfig, UNetConfig, VAEConfig
    from lavie_tpu.io.checkpoints import load_pipeline_params
    from lavie_tpu.pipelines import TextToVideoPipeline

    dump = np.load(args.dump, allow_pickle=True)
    print(f"reference dump keys: {list(dump.keys())}")

    pipe = TextToVideoPipeline.init_random(jax.random.PRNGKey(0))
    if args.ckpt:
        pipe.params = load_pipeline_params(pipe.params, args.ckpt, args.sd_path)
        print("loaded converted reference weights")
    else:
        print("WARNING: no checkpoint — structural comparison only", file=sys.stderr)

    # module-level comparisons when intermediate tensors are in the dump
    if "text_emb" in dump and "token_ids" in dump:
        ours_text = pipe.text_encoder.apply(
            {"params": pipe.params["text_encoder"]}, jnp.asarray(dump["token_ids"])
        )
        # reference layout (B, 77, 768) matches ours
        compare("text_encoder.last_hidden_state", np.asarray(ours_text), dump["text_emb"])

    if "unet_in" in dump and "unet_out" in dump and "unet_t" in dump:
        # reference layout (B, C, F, H, W) → ours (B, F, H, W, C)
        x = np.transpose(dump["unet_in"], (0, 2, 3, 4, 1))
        ref_out = np.transpose(dump["unet_out"], (0, 2, 3, 4, 1))
        ctx = dump["unet_ctx"]
        ours_out = pipe.unet.apply(
            {"params": pipe.params["unet"]},
            jnp.asarray(x), jnp.asarray(dump["unet_t"]).reshape(-1), jnp.asarray(ctx),
        )
        compare("unet.forward", np.asarray(ours_out), ref_out)

    # end-to-end with injected latents
    if "latents" in dump and "video" in dump and "prompt" in dump:
        lat = np.transpose(dump["latents"], (0, 2, 3, 4, 1))  # BCFHW→BFHWC
        out = pipe(
            str(dump["prompt"]),
            latents=lat,
            num_inference_steps=args.steps,
            sample_method="ddim",
        ).video
        ref_video = dump["video"]  # (B, F, H, W, 3) uint8
        p = psnr(out, ref_video)
        print(f"end-to-end PSNR vs reference: {p:.2f} dB (target ≥ 35)")


if __name__ == "__main__":
    main()
