"""Torch-side dumper for the parity harness (tools/parity_harness.py).

Two modes:

  --mode pipeline   (requires the real reference environment: diffusers,
                     transformers, and the released checkpoints)
      Runs the reference base T2V pipeline and dumps the tensors the
      harness replays: initial latents, output video, text embeddings and
      one UNet forward (reference latent-injection point:
      base/pipelines/pipeline_videogen.py:503-506). With these plus
      `lavie_base.pt`, `python tools/parity_harness.py --dump ref_base.npz
      --ckpt …` is the one-command ≥35 dB PSNR check.

  --mode modules    (runs OFFLINE in this image via tests/ref_shim)
      Instantiates the REFERENCE model modules with random weights, and
      dumps (state_dict, input, output) golden triples per module into
      tests/golden/*.npz. tests/test_golden.py replays them through our
      flax modules + converter — pinning the reference's numerical behavior
      even where the reference tree isn't mounted. Weights are stored fp16
      (both sides load the same rounded values, so comparisons stay exact);
      activations fp32.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def _save(name: str, state_dict, inputs: dict, outputs: dict, meta: dict):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    payload = {}
    for k, v in state_dict.items():
        payload[f"sd.{k}"] = np.asarray(v, np.float16)
    for k, v in inputs.items():
        payload[f"in.{k}"] = np.asarray(v, np.float32)
    for k, v in outputs.items():
        payload[f"out.{k}"] = np.asarray(v, np.float32)
    for k, v in meta.items():
        payload[f"meta.{k}"] = np.asarray(v)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    np.savez_compressed(path, **payload)
    kb = os.path.getsize(path) / 1024
    print(f"  wrote {path} ({kb:.0f} KiB)")


def dump_modules():
    import torch

    import ref_shim

    def sd16(mod):
        # round-trip weights through fp16 and LOAD THEM BACK so the dumped
        # outputs were produced by exactly the stored weights
        sd = {k: v.detach().to(torch.float16).to(torch.float32)
              for k, v in mod.state_dict().items()}
        mod.load_state_dict(sd)
        return {k: v.numpy() for k, v in sd.items()}

    g = torch.Generator().manual_seed(0)

    def rand(*shape, scale=1.0):
        return torch.randn(*shape, generator=g) * scale

    def dezero(mod, seed=7):
        gg = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in mod.parameters():
                if p.numel() and bool((p == 0).all()):
                    p.copy_(torch.randn(p.shape, generator=gg) * 0.05)

    # --- base/models/resnet.py ---
    res = ref_shim.load_ref("base", "resnet")
    torch.manual_seed(1)
    blk = res.ResnetBlock3D(in_channels=16, out_channels=24, temb_channels=32,
                            groups=8, dropout=0.0).eval()
    x, temb = rand(2, 16, 3, 8, 8), rand(2, 32)
    sd = sd16(blk)
    with torch.no_grad():
        y = blk(x, temb)
    _save("resnet_block3d", sd, {"x": x, "temb": temb}, {"y": y},
          {"in_channels": 16, "out_channels": 24, "temb_channels": 32, "groups": 8})

    # --- base/models/attention.py: CrossAttention (self + text kv) ---
    att = ref_shim.load_ref("base", "attention")
    torch.manual_seed(2)
    ca = att.CrossAttention(query_dim=32, heads=4, dim_head=8).eval()
    sd = sd16(ca)
    x = rand(2, 24, 32)
    with torch.no_grad():
        y = ca(x)
    _save("cross_attention_self", sd, {"x": x}, {"y": y},
          {"query_dim": 32, "heads": 4, "dim_head": 8})

    torch.manual_seed(3)
    ca2 = att.CrossAttention(query_dim=32, cross_attention_dim=20, heads=4,
                             dim_head=8).eval()
    sd = sd16(ca2)
    x, ctx = rand(2, 24, 32), rand(2, 7, 20)
    with torch.no_grad():
        y = ca2(x, encoder_hidden_states=ctx)
    _save("cross_attention_text", sd, {"x": x, "ctx": ctx}, {"y": y},
          {"query_dim": 32, "heads": 4, "dim_head": 8, "cross_dim": 20})

    # --- TemporalAttention (RoPE + rel-bias) ---
    rot = sys.modules["rotary_embedding_torch"]
    torch.manual_seed(4)
    ta = att.TemporalAttention(query_dim=32, heads=4, dim_head=8,
                               rotary_emb=rot.RotaryEmbedding(8)).eval()
    sd = sd16(ta)
    x = rand(3, 16, 32)
    with torch.no_grad():
        y = ta(x)
    _save("temporal_attention", sd, {"x": x}, {"y": y},
          {"query_dim": 32, "heads": 4, "dim_head": 8, "rope_dim": 8})

    # --- interpolation SparseCausalAttention ---
    iatt = ref_shim.load_ref("interpolation", "attention")
    torch.manual_seed(5)
    sc = iatt.SparseCausalAttention(query_dim=32, heads=4, dim_head=8).eval()
    sd = sd16(sc)
    x = rand(10, 12, 32)  # (b·f, d, c) with f=5
    with torch.no_grad():
        y = sc(x, video_length=5)
    _save("sparse_causal_attention", sd, {"x": x}, {"y": y},
          {"query_dim": 32, "heads": 4, "dim_head": 8, "video_length": 5})

    # --- vsr ResnetBlock3DCNN + TemporalModule3D (CNN path) ---
    vres = ref_shim.load_ref("vsr", "resnet")
    torch.manual_seed(6)
    cnn = vres.ResnetBlock3DCNN(in_channels=16, out_channels=16,
                                kernel=(5, 1, 1), temb_channels=None,
                                groups=8).eval()
    sd = sd16(cnn)
    x = rand(1, 16, 6, 8, 8)
    with torch.no_grad():
        y = cnn(x, None)
    _save("resnet_block3dcnn", sd, {"x": x}, {"y": y},
          {"in_channels": 16, "groups": 8, "kernel_frames": 5})

    tmod = ref_shim.load_ref("vsr", "temporal_module")
    torch.manual_seed(7)
    tm = tmod.TemporalModule3D(in_channels=32, out_channels=32,
                               temb_channels=24, attention_block_types=("", ""),
                               video_condition=False).eval()
    dezero(tm)
    sd = sd16(tm)
    x, temb = rand(1, 32, 4, 8, 8), rand(1, 24)
    with torch.no_grad():
        y = tm(x, temb=temb)
    _save("temporal_module3d", sd, {"x": x, "temb": temb}, {"y": y},
          {"channels": 32, "temb_channels": 24})

    # --- TemporalModule3D with the versatile-attention branch enabled ---
    # (TemporalTransformer3DModel wrapper + AdaLayerNorm + all-mode
    # VersatileSelfAttention, reference: temporal_module.py:116-143).
    # Keys are dumped under a mid_temporal_block. prefix — the context real
    # checkpoints provide, which gates the converter's attn_temporal remap
    # OFF for this subtree.
    torch.manual_seed(9)
    tmv = tmod.TemporalModule3D(
        in_channels=32, out_channels=32, temb_channels=24,
        num_attention_layers=1, num_attention_head=8, attention_dim_div=2,
        attention_block_types=("SpatialTemporalShift", "CrossFrame"),
        cross_frame_attention_mode="0_i-1_i", temporal_shift_fold_div=2,
        temporal_shift_direction="right", use_dcn_warpping=False,
        use_deformable_conv=False, video_condition=False,
    ).eval()
    dezero(tmv)
    sd = {f"mid_temporal_block.{k}": v for k, v in sd16(tmv).items()}
    # dedicated generator: keeps the shared stream (and every later golden)
    # byte-stable against this insertion
    gv = torch.Generator().manual_seed(90)
    x = torch.randn(2, 32, 4, 8, 8, generator=gv)
    temb = torch.randn(2, 24, generator=gv)
    ts = torch.tensor([37, 503])
    with torch.no_grad():
        y = tmv(x, temb=temb, timesteps=ts)
    _save("temporal_module3d_versatile", sd,
          {"x": x, "temb": temb, "timesteps": ts.numpy()}, {"y": y},
          {"channels": 32, "temb_channels": 24, "heads": 8, "dim_div": 2})

    # --- TemporalModule3D: video_condition + use_scale_shift branches ---
    # (reference: temporal_module.py:106-112, :145-176; v_cond_conv needs
    # C/4 >= 32 for its groups_out=32 GroupNorm)
    torch.manual_seed(10)
    tmc = tmod.TemporalModule3D(
        in_channels=128, out_channels=128, temb_channels=24,
        attention_block_types=("", ""), use_scale_shift=True,
        video_condition=True,
    ).eval()
    dezero(tmc)
    sd = {f"mid_temporal_block.{k}": v for k, v in sd16(tmc).items()}
    gc_ = torch.Generator().manual_seed(100)
    x = torch.randn(2, 128, 4, 4, 4, generator=gc_)
    cond = torch.randn(2, 3, 4, 4, 4, generator=gc_)
    temb = torch.randn(2, 24, generator=gc_)
    with torch.no_grad():
        y = tmc(x, condition_video=cond, temb=temb)
    _save("temporal_module3d_vidcond", sd,
          {"x": x, "cond": cond, "temb": temb}, {"y": y},
          {"channels": 128, "temb_channels": 24})

    # --- full tiny base UNet forward ---
    unet = ref_shim.load_ref("base", "unet")
    torch.manual_seed(8)
    un = unet.UNet3DConditionModel(
        in_channels=4, out_channels=4, block_out_channels=(32, 32, 32, 32),
        layers_per_block=1, norm_num_groups=8, cross_attention_dim=24,
        attention_head_dim=1,
    ).eval()
    dezero(un)
    sd = sd16(un)
    x, ctx = rand(1, 4, 3, 16, 16), rand(1, 7, 24)
    t = np.array([3])
    with torch.no_grad():
        y = un(x, torch.tensor(t), encoder_hidden_states=ctx).sample
    _save("tiny_base_unet", sd, {"x": x, "ctx": ctx, "t": t}, {"y": y},
          {"block_out_channels": (32, 32, 32, 32), "heads": 1,
           "cross_attention_dim": 24, "norm_num_groups": 8})


def dump_pipeline(args):
    """Run inside the real reference environment (not this image)."""
    sys.path.insert(0, os.path.join(args.reference, "base"))
    sys.path.insert(0, os.path.join(args.reference, "base", "pipelines"))
    import torch
    from diffusers import AutoencoderKL, DDIMScheduler
    from transformers import CLIPTextModel, CLIPTokenizer

    from models import get_models  # noqa: reference base/models/__init__.py
    from pipeline_videogen import VideoGenPipeline

    class A:  # minimal arg object for get_models
        model = "UNet"
        pretrained_path = args.sd_path

    unet = get_models(A(), args.sd_path)
    sd_ckpt = torch.load(args.ckpt, map_location="cpu")
    unet.load_state_dict(sd_ckpt["ema"] if "ema" in sd_ckpt else sd_ckpt)
    vae = AutoencoderKL.from_pretrained(args.sd_path, subfolder="vae")
    tokenizer = CLIPTokenizer.from_pretrained(args.sd_path, subfolder="tokenizer")
    text_encoder = CLIPTextModel.from_pretrained(args.sd_path, subfolder="text_encoder")
    scheduler = DDIMScheduler.from_pretrained(args.sd_path, subfolder="scheduler")
    pipe = VideoGenPipeline(vae=vae, text_encoder=text_encoder,
                            tokenizer=tokenizer, scheduler=scheduler, unet=unet)

    torch.manual_seed(args.seed)
    latents = torch.randn(1, 4, 16, 40, 64)
    ids = tokenizer([args.prompt], padding="max_length", max_length=77,
                    truncation=True, return_tensors="pt").input_ids
    with torch.no_grad():
        text_emb = text_encoder(ids).last_hidden_state
        t = torch.tensor([981])
        unet_in = torch.cat([latents, latents])
        unet_out = unet(unet_in, t.repeat(2),
                        encoder_hidden_states=text_emb.repeat(2, 1, 1)).sample
        video = pipe(args.prompt, latents=latents, video_length=16, height=320,
                     width=512, num_inference_steps=args.steps,
                     guidance_scale=7.5).video
    np.savez(args.out, latents=latents.numpy(), video=np.asarray(video),
             prompt=args.prompt, token_ids=ids.numpy(),
             text_emb=text_emb.numpy(), unet_in=unet_in.numpy(),
             unet_t=t.numpy(), unet_ctx=text_emb.repeat(2, 1, 1).numpy(),
             unet_out=unet_out.numpy())
    print(f"wrote {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("modules", "pipeline"), default="modules")
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--ckpt", help="lavie_base.pt (pipeline mode)")
    p.add_argument("--sd-path", help="stable-diffusion-v1-4 dir (pipeline mode)")
    p.add_argument("--prompt", default="a teddy bear walking on the beach, 4k")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=400)
    p.add_argument("--out", default="ref_base.npz")
    args = p.parse_args(argv)
    if args.mode == "modules":
        dump_modules()
    else:
        dump_pipeline(args)


if __name__ == "__main__":
    main()
