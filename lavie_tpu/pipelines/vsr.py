"""Video super-resolution (VSR) pipeline: ×4 upscale, 320×512 → 1280×2048.

The reference drives a temporally-augmented SD x4-upscaler UNet with a
vendored v-prediction DDIM and processes the video in 8-frame windows
(reference: vsr/sample.py:100-119,
vsr/models/pipeline_stable_diffusion_upscale_video_3d.py:491-780). Here each
window — low-res noising, the 50-step v-pred DDIM loop with per-step low-res
channel concat + noise-level class conditioning, and the two-phase VAE decode
(all frames batched through the latent-res mid block, then the memory-dominant
×4 upsampling half in per-frame chunks; bf16 interface with fp32-accumulated
norm stats) — is one jitted XLA program.

Key mechanics mirrored exactly:
  - latents live at the INPUT resolution; the f4 VAE decoder performs the ×4
    (reference: prepare_latents_3d …:441-452, vae_config.json)
  - the low-res frames are DDPM-noised at `noise_level` and that level is fed
    as a learned class embedding (reference: …:631-634, vsr/models/unet.py:179-186)
  - v-prediction x0/eps recovery in the stepper
    (reference: vsr/diffusion/scheduling_ddim.py:358-368)
  - timesteps use the vendored linspace spacing
    (reference: vsr/diffusion/scheduling_ddim.py:268-291; as written that
    code indexes one past the alpha table — we interpret it as the clamped
    [999 … 0] linspace grid)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.core.config import CLIPTextConfig, SamplingConfig, UNetConfig, VAEConfig
from lavie_tpu.diffusion import NoiseSchedule, add_noise
from lavie_tpu.diffusion.samplers import (
    classifier_free_guidance,
    ddim_step,
    ddim_timesteps,
    prev_timesteps,
)
from lavie_tpu.io.tokenizer import CLIPTokenizer
from lavie_tpu.nn.clip import CLIPTextModel
from lavie_tpu.nn.unet import UNet3D
from lavie_tpu.nn.vae import AutoencoderKL


@dataclasses.dataclass
class VSROutput:
    video: np.ndarray  # (F, 4H, 4W, 3) uint8


class VideoSuperResolutionPipeline:
    def __init__(
        self,
        unet_config: UNetConfig,
        vae_config: VAEConfig,
        text_config: CLIPTextConfig,
        params: Dict[str, Any],
        sampling: SamplingConfig = SamplingConfig(
            num_inference_steps=50, guidance_scale=5.0, sample_method="ddim",
            prediction_type="v_prediction",
            # the x4-upscaler DDIM config sets clip_sample=false explicitly
            clip_sample=False,
        ),
        tokenizer: Optional[CLIPTokenizer] = None,
        dtype: Any = jnp.bfloat16,
        noise_level: int = 50,
        window: int = 8,
        # fp32 decode to 1280×2048 costs ~5 GB of norm activations PER FRAME;
        # one v5e chip fits exactly one frame at a time (the reference's
        # 4-frame chunks assume a 40 GB GPU, reference: …3d.py:757-771)
        decode_chunk: int = 1,
        mesh: Optional[Any] = None,
        split_cfg: bool = True,
        loop_mode: Optional[str] = None,
        scan_chunk: Optional[int] = None,
        window_batch: int = 1,
        low_res_schedule: Optional[NoiseSchedule] = None,
    ):
        import os as _os

        # see DESIGN.md: "python" = step-level jit for slow-compile envs
        self.loop_mode = loop_mode or _os.environ.get("LAVIE_LOOP_MODE", "scan")
        # hybrid mode: denoise steps per scanned dispatch (0 = all in one).
        # Full-size 50-step programs run ~100 s of device time, which the
        # remote TPU worker kills; 10-step chunks (~20 s programs) are safe
        # and one compiled executable serves every chunk.
        self.scan_chunk = (
            scan_chunk
            if scan_chunk is not None
            else int(_os.environ.get("LAVIE_SCAN_CHUNK", "10"))
        )
        # split_cfg: evaluate the cond/uncond halves sequentially instead of a
        # doubled batch — same math, half the activation memory. Needed on one
        # v5e chip: the doubled batch at 8×320×512 latents wants 18.8G HBM
        # (measured); split it fits. Multi-chip meshes can set False.
        self.split_cfg = split_cfg
        self.mesh = mesh
        # windows per batched program; a dp mesh raises this to the dp size
        self.window_batch = window_batch
        assert unet_config.in_channels == 7, "VSR UNet takes 4 latent + 3 RGB channels"
        self.unet_config = unet_config
        self.vae_config = vae_config
        self.text_config = text_config
        self.sampling = sampling
        self.dtype = dtype
        self.params = params
        self.noise_level = noise_level
        self.window = window
        self.decode_chunk = decode_chunk
        self.tokenizer = tokenizer or CLIPTokenizer(
            max_length=text_config.max_position_embeddings,
            vocab_size=text_config.vocab_size,
        )
        self.unet = UNet3D(config=unet_config, dtype=dtype)
        self.vae = AutoencoderKL(config=vae_config, dtype=dtype)
        self.text_encoder = CLIPTextModel(config=text_config, dtype=dtype)
        self.schedule = NoiseSchedule.create(
            sampling.beta_schedule,
            sampling.num_train_timesteps,
            sampling.beta_start,
            sampling.beta_end,
        )
        # Low-res noise augmentation schedule — a SEPARATE schedule from the
        # sampler's. The reference noises the conditioning with the pretrained
        # pipeline's `low_res_scheduler` (reference: …3d.py:631-634), which
        # ships with the x4-upscaler checkpoint as a scaled_linear-β DDPM —
        # the reference only overrides the MAIN scheduler's β to linear
        # (vsr/sample.py:50-53), never the low-res one. Defaulting to the
        # published scaled_linear table keeps the conditioning noise level
        # faithful at parity time; configurable for other checkpoints.
        if low_res_schedule is None:
            from lavie_tpu.diffusion.noise_aug import low_scale_schedule

            low_res_schedule = low_scale_schedule(sampling.num_train_timesteps)
        self.low_res_schedule = low_res_schedule
        self._compiled: Dict[Any, Any] = {}

    @classmethod
    def init_random(
        cls,
        rng: jax.Array,
        unet_config: UNetConfig = UNetConfig.vsr(),
        vae_config: VAEConfig = VAEConfig.vsr(),
        text_config: CLIPTextConfig = CLIPTextConfig.open_clip_h(),
        dtype: Any = jnp.bfloat16,
        **kw,
    ) -> "VideoSuperResolutionPipeline":
        k1, k2, k3 = jax.random.split(rng, 3)
        unet = UNet3D(config=unet_config, dtype=dtype)
        vae = AutoencoderKL(config=vae_config, dtype=dtype)
        text = CLIPTextModel(config=text_config, dtype=dtype)
        s = 32
        lat = jnp.zeros((1, 2, s, s, unet_config.in_channels))
        ctx = jnp.zeros((1, text_config.max_position_embeddings, unet_config.cross_attention_dim))
        unet_params = jax.jit(unet.init)(
            k1, lat, jnp.array([0]), ctx, jnp.array([50])
        )["params"]
        vae_params = jax.jit(vae.init)(k2, jnp.zeros((1, s * 2, s * 2, 3)))["params"]
        ids = jnp.zeros((1, text_config.max_position_embeddings), dtype=jnp.int32)
        text_params = jax.jit(text.init)(k3, ids)["params"]
        params = {"unet": unet_params, "vae": vae_params, "text_encoder": text_params}
        return cls(unet_config, vae_config, text_config, params, dtype=dtype, **kw)

    # ------------------------------------------------------------------

    def _make_prep(self, batch: int, frames: int, height: int, width: int,
                   inject: bool):
        """ONE definition site for the conditioning/injection prep shared by
        the scanned and stepwise builders (traced inline by the scan sampler,
        jitted standalone by the stepwise one) — so the golden-injection path
        and the production path cannot drift apart.

        Returns prep(params, token_ids, frames_in, noise_level, key) ->
        (text_states, image_c, x):
          frames_in: (B, F, H, W, 3) in [-1, 1]. image_c is the low-res
          conditioning DDPM-noised at noise_level (reference: …3d.py:631-634),
          x the initial latents.
          Injection (parity goldens, inject=True): token_ids is the
          precomputed [uncond; cond] text states and key is the tuple
          (lr_noise, init_latents) — the reference's low-res augmentation ε
          and prepare_latents_3d randn (…3d.py:441-452)."""
        dtype = self.dtype
        text_encoder = self.text_encoder
        low_res_schedule = self.low_res_schedule

        def prep(params, token_ids, frames_in, noise_level, key):
            if inject:
                text_states = token_ids.astype(dtype)
                lr_noise, x0 = key
                noise = lr_noise.astype(jnp.float32)
            else:
                text_states = text_encoder.apply(
                    {"params": params["text_encoder"]}, token_ids
                ).astype(dtype)
                lr_key, lat_key = jax.random.split(key)
                # DDPM-noise the low-res conditioning at noise_level
                noise = jax.random.normal(lr_key, frames_in.shape, dtype=jnp.float32)
            image_c = add_noise(
                low_res_schedule,
                frames_in.astype(jnp.float32),
                noise,
                jnp.broadcast_to(noise_level, (batch,)),
            ).astype(dtype)
            if inject:
                x = x0.astype(jnp.float32)
            else:
                x = jax.random.normal(
                    lat_key, (batch, frames, height, width, 4), dtype=jnp.float32
                )
            return text_states, image_c, x

        return prep

    def _build_sampler(self, batch: int, frames: int, height: int, width: int,
                       num_inference_steps: int, inject: bool = False):
        dtype = self.dtype
        schedule = self.schedule
        scaling = self.vae_config.scaling_factor
        upscale = self.vae_config.downscale_factor  # f4: decoder upsamples ×4
        unet, vae = self.unet, self.vae
        decode_chunk = self.decode_chunk

        # stock diffusers DDIM spacing: BOTH reference entry points replace
        # the vendored linspace scheduler with DDIMScheduler.from_config(the
        # x4-upscaler config, steps_offset=1, set_alpha_to_one=False,
        # beta_schedule overridden to linear) — vsr/sample.py:49-53,
        # predict.py:148-156. The vendored scheduling_ddim.py linspace is dead.
        ts = ddim_timesteps(num_inference_steps, self.sampling.num_train_timesteps)
        pts = prev_timesteps(ts, self.sampling.num_train_timesteps)
        ts_arr, pts_arr = jnp.asarray(ts), jnp.asarray(pts)
        prep = self._make_prep(batch, frames, height, width, inject)

        def sample_fn(params, token_ids, frames_in, noise_level, guidance_scale, key):
            text_states, image_c, x = prep(params, token_ids, frames_in,
                                           noise_level, key)
            nl1 = jnp.broadcast_to(noise_level, (batch,))

            def unet_half(x, t, text_half, prefix=None):
                xin = jnp.concatenate([x.astype(dtype), image_c], axis=-1)  # 7ch
                return unet.apply(
                    {"params": params["unet"]},
                    xin,
                    jnp.broadcast_to(t, (batch,)),
                    text_half,
                    class_labels=nl1,
                    prefix=prefix,
                ).astype(jnp.float32)

            def body(x, tp):
                t, pt = tp
                if self.split_cfg:
                    # sequential halves: half the peak activation memory.
                    # The text-independent prefix (conv_in + the full-res
                    # DownBlock3D + its temporal module) is shared — computed
                    # once instead of per half (UNet3D.forward_prefix).
                    prefix = None
                    if unet.num_prefix_blocks > 0:
                        xin = jnp.concatenate([x.astype(dtype), image_c], axis=-1)
                        prefix = unet.apply(
                            {"params": params["unet"]},
                            xin,
                            jnp.broadcast_to(t, (batch,)),
                            nl1,
                            method=UNet3D.forward_prefix,
                        )
                    pred_u = unet_half(x, t, text_states[:batch], prefix)
                    pred_c = unet_half(x, t, text_states[batch:], prefix)
                    v = pred_u + guidance_scale * (pred_c - pred_u)
                else:
                    xin = jnp.concatenate([x, x], axis=0).astype(dtype)
                    xin = jnp.concatenate(
                        [xin, jnp.concatenate([image_c, image_c], axis=0)], axis=-1
                    )
                    pred = unet.apply(
                        {"params": params["unet"]},
                        xin,
                        jnp.broadcast_to(t, (2 * batch,)),
                        text_states,
                        class_labels=jnp.broadcast_to(noise_level, (2 * batch,)),
                    ).astype(jnp.float32)
                    v = classifier_free_guidance(pred, guidance_scale)
                x = ddim_step(schedule, x, v, t, pt, prediction_type="v_prediction",
                              final_alpha_bar=schedule.alphas_cumprod[0])
                return x, None

            x, _ = jax.lax.scan(body, x, (ts_arr, pts_arr))

            # VAE decode in small FRAME chunks with the batch (window) axis
            # preserved — on a dp mesh each chip decodes its own window
            # locally, no cross-chip gathers. The reference decodes fp32, 4
            # frames at a time (…:741-771); here the decoder computes in the
            # pipeline dtype (bf16) with fp32-accumulated norm stats — the
            # fp32 casts below are interface dtype only.
            z = (x / scaling).astype(jnp.float32)  # (B, F, h, w, 4)
            # two-phase decode: the latent-resolution mid block is cheap in
            # memory, so ALL frames batch through it at once (full batch
            # sublanes for its convs — per-frame they degrade to a 26 TF/s
            # T(2,128) layout next to the flash call, DESIGN.md); only the
            # memory-dominant upsampling half runs per decode_chunk frames.
            # decode_up(decode_mid(z)) ≡ decode(z) exactly (tested).
            h_mid = vae.apply(
                {"params": params["vae"]},
                z.reshape(batch * frames, height, width, 4),
                method=AutoencoderKL.decode_mid,
            )
            h_mid = h_mid.reshape(batch, frames, height, width, -1)
            chunks = []
            for i in range(0, frames, decode_chunk):
                c = min(decode_chunk, frames - i)
                hc = jax.lax.dynamic_slice_in_dim(h_mid, i, c, 1)
                rgb_c = vae.apply(
                    {"params": params["vae"]},
                    hc.reshape(batch * c, height, width, h_mid.shape[-1]),
                    method=AutoencoderKL.decode_up,
                ).astype(jnp.float32)
                chunks.append(
                    rgb_c.reshape(batch, c, height * upscale, width * upscale, 3)
                )
            rgb = jnp.concatenate(chunks, axis=1)
            video = jnp.clip(rgb, -1.0, 1.0)
            video = jnp.clip(video / 2 + 0.5, 0.0, 1.0)
            return jnp.round(video * 255.0).astype(jnp.uint8)

        return jax.jit(sample_fn)

    # ------------------------------------------------------------------

    def _build_stepwise(self, batch: int, frames: int, height: int, width: int,
                        num_inference_steps: int, inject: bool = False):
        """Step-level jit variant (loop_mode='python'); same math as the
        scanned sampler, always split-CFG. loop_mode='hybrid' scans the
        denoise loop in ONE jitted program (the scan body compiles once, so
        the remote compiler handles it — unlike the full 'scan' sampler,
        whose unrolled decode-chunk loop inlines `frames/decode_chunk` VAE
        decoder copies into a single module) while prep and the per-chunk
        decode stay separate programs: 200 per-window dispatches → ~10."""
        dtype = self.dtype
        schedule = self.schedule
        scaling = self.vae_config.scaling_factor
        upscale = self.vae_config.downscale_factor
        unet, vae = self.unet, self.vae
        decode_chunk = self.decode_chunk

        # stock diffusers DDIM spacing: BOTH reference entry points replace
        # the vendored linspace scheduler with DDIMScheduler.from_config(the
        # x4-upscaler config, steps_offset=1, set_alpha_to_one=False,
        # beta_schedule overridden to linear) — vsr/sample.py:49-53,
        # predict.py:148-156. The vendored scheduling_ddim.py linspace is dead.
        ts = ddim_timesteps(num_inference_steps, self.sampling.num_train_timesteps)
        pts = prev_timesteps(ts, self.sampling.num_train_timesteps)

        prep_fn = jax.jit(self._make_prep(batch, frames, height, width, inject))

        @jax.jit
        def prefix_fn(params, x, image_c, t, noise_level):
            xin = jnp.concatenate([x.astype(dtype), image_c], axis=-1)
            return unet.apply(
                {"params": params["unet"]}, xin, jnp.broadcast_to(t, (batch,)),
                jnp.broadcast_to(noise_level, (batch,)),
                method=UNet3D.forward_prefix,
            )

        @jax.jit
        def step_half(params, x, image_c, text_half, t, noise_level, prefix=None):
            xin = jnp.concatenate([x.astype(dtype), image_c], axis=-1)
            return unet.apply(
                {"params": params["unet"]}, xin,
                jnp.broadcast_to(t, (batch,)), text_half,
                class_labels=jnp.broadcast_to(noise_level, (batch,)),
                prefix=prefix,
            ).astype(jnp.float32)

        @jax.jit
        def combine_fn(x, pred_u, pred_c, t, pt, guidance):
            v = pred_u + guidance * (pred_c - pred_u)
            return ddim_step(schedule, x, v, t, pt, prediction_type="v_prediction",
                              final_alpha_bar=schedule.alphas_cumprod[0])

        @jax.jit
        def decode_mid_fn(params, z_all):
            # all frames batched through the latent-res mid block (see the
            # scan path's two-phase decode comment)
            return vae.apply(
                {"params": params["vae"]}, z_all.astype(jnp.float32),
                method=AutoencoderKL.decode_mid,
            )

        @jax.jit
        def decode_chunk_fn(params, h_chunk):
            # finalize PER CHUNK (clip/scale/round→uint8): elementwise, so
            # bit-identical to the old whole-window finalize, and the uint8
            # chunk can stream to host while the NEXT chunk decodes
            rgb = vae.apply(
                {"params": params["vae"]}, h_chunk,
                method=AutoencoderKL.decode_up,
            ).astype(jnp.float32)
            rgb = jnp.clip(rgb, -1.0, 1.0)
            rgb = jnp.clip(rgb / 2 + 0.5, 0.0, 1.0)
            return jnp.round(rgb * 255.0).astype(jnp.uint8)

        ts_arr, pts_arr = jnp.asarray(ts), jnp.asarray(pts)

        # ts/pts enter as ARGUMENTS (not closure constants): the jit caches
        # on shape, so one compiled executable serves every K-step chunk of
        # the schedule. Chunking bounds single-program device time — a whole
        # 50-step full-size scan is a ~100 s program, which the remote TPU
        # worker's watchdog kills (measured: steps=10 OK, steps=50 crashes
        # the worker); K=10 chunks keep ~1/10th the dispatches of the python
        # loop while every program stays ~20 s.
        @jax.jit
        def denoise_scan_fn(params, text_states, image_c, x, ts_c, pts_c,
                            noise_level, guidance):
            share_prefix = unet.num_prefix_blocks > 0

            def body(x, tp):
                t, pt = tp
                prefix = None
                if share_prefix:
                    xin = jnp.concatenate([x.astype(dtype), image_c], axis=-1)
                    prefix = unet.apply(
                        {"params": params["unet"]}, xin,
                        jnp.broadcast_to(t, (batch,)),
                        jnp.broadcast_to(noise_level, (batch,)),
                        method=UNet3D.forward_prefix,
                    )

                def half(text_half):
                    xin = jnp.concatenate([x.astype(dtype), image_c], axis=-1)
                    return unet.apply(
                        {"params": params["unet"]}, xin,
                        jnp.broadcast_to(t, (batch,)), text_half,
                        class_labels=jnp.broadcast_to(noise_level, (batch,)),
                        prefix=prefix,
                    ).astype(jnp.float32)

                # lax.map serializes the two CFG halves: as two inline calls
                # XLA's scheduler interleaves them and both halves' peak
                # activations coexist → +1.1 GB HBM OOM at the full window
                # (measured 16.89/15.75 GB). Sequenced, each half reuses the
                # same buffers, matching the python loop's per-program peak.
                preds = jax.lax.map(
                    half, text_states.reshape(2, batch, *text_states.shape[1:])
                )
                pred_u, pred_c = preds[0], preds[1]
                v = pred_u + guidance * (pred_c - pred_u)
                x = ddim_step(schedule, x, v, t, pt,
                              prediction_type="v_prediction",
                              final_alpha_bar=schedule.alphas_cumprod[0])
                return x, None

            x, _ = jax.lax.scan(body, x, (ts_c, pts_c))
            return x

        hybrid = self.loop_mode == "hybrid"
        scan_chunk = self.scan_chunk

        def sample_fn(params, token_ids, frames_in, noise_level, guidance, key):
            text_states, image_c, x = prep_fn(params, token_ids, frames_in, noise_level, key)
            if hybrid:
                n = len(ts)
                k = scan_chunk if scan_chunk > 0 else n
                for i in range(0, n, k):
                    x = denoise_scan_fn(
                        params, text_states, image_c, x,
                        ts_arr[i : i + k], pts_arr[i : i + k],
                        noise_level, guidance,
                    )
            else:
                share_prefix = unet.num_prefix_blocks > 0
                for i in range(len(ts)):
                    t = jnp.int32(int(ts[i]))
                    prefix = (
                        prefix_fn(params, x, image_c, t, noise_level)
                        if share_prefix else None
                    )
                    pred_u = step_half(params, x, image_c, text_states[:batch], t, noise_level, prefix)
                    pred_c = step_half(params, x, image_c, text_states[batch:], t, noise_level, prefix)
                    x = combine_fn(x, pred_u, pred_c, t, jnp.int32(int(pts[i])), guidance)
            z = x / scaling  # (B, F, h, w, 4)
            h_mid = decode_mid_fn(
                params, z.reshape(batch * frames, height, width, 4)
            )
            h_mid = h_mid.reshape(batch, frames, height, width, -1)
            # Streaming decode (r5, VERDICT r4 #2): fetch chunk i-1 to host
            # WHILE chunk i decodes on device — the per-window host fetch
            # (~3.4 s/window measured in the r4 cascade reconciliation) hides
            # under the window's own decode compute. Only one ~8 MB uint8
            # chunk is ever pinned, and never during the denoise-phase HBM
            # peak (a cross-WINDOW variant of this overlap pinned the whole
            # 63 MB window output through the next window's denoise and
            # OOM'd at full size — measured RESOURCE_EXHAUSTED).
            import os as _os2
            import sys as _sys
            import time as _time

            timing = _os2.environ.get("LAVIE_VSR_TIMING", "0") == "1"
            fetch_wait = 0.0
            host_chunks = []
            pending = None
            for i in range(0, frames, decode_chunk):
                c = min(decode_chunk, frames - i)
                rgb_c = decode_chunk_fn(
                    params,
                    h_mid[:, i : i + c].reshape(
                        batch * c, height, width, h_mid.shape[-1]
                    ),
                ).reshape(batch, c, height * upscale, width * upscale, 3)
                if pending is not None:
                    t0 = _time.perf_counter()
                    host_chunks.append(np.asarray(pending))
                    fetch_wait += _time.perf_counter() - t0
                pending = rgb_c
            t0 = _time.perf_counter()
            host_chunks.append(np.asarray(pending))
            fetch_wait += _time.perf_counter() - t0
            if timing:
                print(f"[vsr-timing] decode fetch wait {fetch_wait:.2f}s "
                      f"({len(host_chunks)} chunks)",
                      file=_sys.stderr, flush=True)
            return np.concatenate(host_chunks, axis=1)

        return sample_fn

    def __call__(
        self,
        video: np.ndarray,  # (F, H, W, 3) uint8 or float [-1,1]
        prompt: str = "",
        negative_prompt: str = "blur, worst quality",
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        noise_level: Optional[int] = None,
        seed: int = 10,
        text_states: Optional[np.ndarray] = None,
        latents: Optional[np.ndarray] = None,
        lr_noise: Optional[np.ndarray] = None,
    ) -> VSROutput:
        steps = num_inference_steps or self.sampling.num_inference_steps
        guidance = guidance_scale if guidance_scale is not None else self.sampling.guidance_scale
        nl = noise_level if noise_level is not None else self.noise_level

        frames = np.asarray(video)
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
            frames = (frames - 0.5) * 2.0
        total, height, width, _ = frames.shape

        # Parity-golden injection (like t2v's latents/text_states): the
        # reference's [uncond; cond] text states, initial latents
        # (prepare_latents_3d randn) and low-res augmentation noise replace
        # every RNG draw — torch and JAX RNGs differ, so per-seed parity
        # injects the reference's tensors. Single-window runs only.
        inject = (
            text_states is not None or latents is not None or lr_noise is not None
        )
        if inject:
            assert (
                text_states is not None and latents is not None and lr_noise is not None
            ), "golden injection needs text_states, latents AND lr_noise"
            assert total <= self.window, "golden injection supports one window"

        key = jax.random.PRNGKey(seed)

        # split into fixed-size windows (the reference's last window is
        # shape-dynamic — XLA wants static, reference: vsr/sample.py:100-119).
        # Serial execution (group == 1) compiles ONE extra program for a short
        # tail window instead of padding it to `win` — at 61 frames the tail
        # is 5/8 padding, ~4.6% of the whole VSR compute thrown away. Batched
        # (dp / window_batch) execution still pads: the windows run
        # concurrently, so the wall clock is the max over windows and the
        # padding costs nothing there, while a ragged batch would.
        dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        group = max(dp, self.window_batch, 1)
        win = min(self.window, total)
        chunks = []
        spans = []
        for start in range(0, total, win):
            end = min(total, start + win)
            chunk = frames[start:end]
            pad = win - chunk.shape[0]
            if pad and group > 1:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)], axis=0)
            chunks.append(chunk)
            spans.append((start, end))

        # Windows are independent — the natural multi-chip axis. On a dp mesh
        # all windows run as ONE batched program, sharded over chips; XLA
        # needs no cross-window collectives (the video analog of data
        # parallelism; the reference runs them serially on one GPU).
        # Per-window host work overlaps device compute INSIDE the stepwise
        # sampler (streaming decode — see _build_stepwise); a cross-window
        # depth-1 pipeline was tried first and OOM'd at full size (it pinned
        # a finished window's 63 MB output through the next window's
        # denoise-phase HBM peak, which runs within tens of MB of the
        # 15.75 GB ceiling — measured RESOURCE_EXHAUSTED).
        import os as _os
        import time as _time

        timing = _os.environ.get("LAVIE_VSR_TIMING", "0") == "1"
        outs = [None] * len(chunks)
        for g0 in range(0, len(chunks), group):
            t_win = _time.perf_counter()
            batch_chunks = chunks[g0 : g0 + group]
            n_real = len(batch_chunks)
            while len(batch_chunks) < group:  # pad the window batch for dp
                batch_chunks.append(batch_chunks[-1])
            bsz = len(batch_chunks)
            gwin = batch_chunks[0].shape[0]
            cache_key = (bsz, gwin, height, width, steps, self.loop_mode,
                         self.scan_chunk, inject)
            if cache_key not in self._compiled:
                builder = (
                    self._build_stepwise
                    if self.loop_mode in ("python", "hybrid")
                    else self._build_sampler
                )
                self._compiled[cache_key] = builder(bsz, gwin, height, width, steps,
                                                    inject=inject)
            if inject:
                token_ids = jnp.asarray(text_states, dtype=jnp.float32)
            else:
                token_ids = jnp.asarray(
                    np.concatenate(
                        [
                            np.repeat(self.tokenizer([negative_prompt]), bsz, axis=0),
                            np.repeat(self.tokenizer([prompt]), bsz, axis=0),
                        ],
                        axis=0,
                    )
                )
            key, sub = jax.random.split(key)
            if inject:
                sub = (
                    jnp.asarray(lr_noise, dtype=jnp.float32).reshape(
                        bsz, gwin, height, width, 3
                    ),
                    jnp.asarray(latents, dtype=jnp.float32).reshape(
                        bsz, gwin, height, width, 4
                    ),
                )
            batch_in = jnp.asarray(np.stack(batch_chunks))
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = P(
                    "dp" if bsz % max(self.mesh.shape.get("dp", 1), 1) == 0 else None,
                    "sp" if gwin % max(self.mesh.shape.get("sp", 1), 1) == 0 else None,
                )
                batch_in = jax.device_put(batch_in, NamedSharding(self.mesh, spec))
            out = np.asarray(
                self._compiled[cache_key](
                    self.params, token_ids, batch_in,
                    jnp.int32(nl), jnp.float32(guidance), sub,
                )
            )
            for j in range(n_real):
                start, end = spans[g0 + j]
                outs[g0 + j] = out[j][: end - start]
            if timing:
                import sys as _sys

                print(f"[vsr-timing] window {g0 // group} "
                      f"({gwin}f): {_time.perf_counter() - t_win:.2f}s",
                      file=_sys.stderr, flush=True)
        return VSROutput(video=np.concatenate(outs, axis=0))
