"""Base text-to-video pipeline.

The reference's VideoGenPipeline runs a Python loop calling scheduler.step 50
times with per-step host sync (reference: base/pipelines/pipeline_videogen.py:512-695).
Here the whole sample — CFG batch doubling, UNet, stepper, and VAE decode —
compiles to ONE XLA program with the denoise loop as `lax.scan`.

Public surface mirrors the reference call:
    pipeline(prompt, video_length=16, height=320, width=512,
             num_inference_steps=50, guidance_scale=7.5).video
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.core.config import (
    CLIPTextConfig,
    SamplingConfig,
    UNetConfig,
    VAEConfig,
)
from lavie_tpu.diffusion import NoiseSchedule
from lavie_tpu.diffusion.samplers import (
    classifier_free_guidance,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    ddpm_timesteps,
    euler_scale_model_input,
    euler_sigmas,
    euler_step,
    prev_timesteps,
)
from lavie_tpu.io.tokenizer import CLIPTokenizer
from lavie_tpu.nn.clip import CLIPTextModel, CLIPVisionConfig, CLIPVisionModel
from lavie_tpu.nn.mapping import MappingNetwork
from lavie_tpu.nn.unet import UNet3D
from lavie_tpu.nn.vae import AutoencoderKL


@dataclasses.dataclass
class PipelineOutput:
    video: np.ndarray  # (B, F, H, W, 3) uint8


class TextToVideoPipeline:
    """Owns the three models' configs + params and a cache of compiled
    samplers keyed by static sampling shapes."""

    def __init__(
        self,
        unet_config: UNetConfig,
        vae_config: VAEConfig,
        text_config: CLIPTextConfig,
        params: Dict[str, Any],
        sampling: SamplingConfig = SamplingConfig(),
        tokenizer: Optional[CLIPTokenizer] = None,
        dtype: Any = jnp.bfloat16,
        vision_config: Optional[CLIPVisionConfig] = None,
        mapping_network: Optional[MappingNetwork] = None,
        mesh: Optional[Any] = None,
    ):
        # Optional (dp, sp, tp) mesh: latents are sharded batch→dp, frames→sp
        # and XLA propagates — spatial convs/attention and the VAE are
        # embarrassingly parallel over frames; only the f×f temporal attention
        # induces collectives, riding ICI (SURVEY §5.7 TPU-native plan).
        self.mesh = mesh
        # "scan": whole sample is ONE XLA program (deployment shape).
        # "python": step-level jit driven from Python — for environments whose
        # compile service chokes on the scanned full-size program (see
        # DESIGN.md), and for per-step callbacks. Env LAVIE_LOOP_MODE overrides.
        import os as _os

        self.loop_mode = _os.environ.get("LAVIE_LOOP_MODE", "scan")
        # hybrid: denoise steps per scanned dispatch (0 = all in one program);
        # bounds single-program device time (see DESIGN.md).
        self.scan_chunk = int(_os.environ.get("LAVIE_SCAN_CHUNK", "10"))
        self.unet_config = unet_config
        self.vae_config = vae_config
        self.text_config = text_config
        self.sampling = sampling
        self.dtype = dtype
        self.params = params
        self.tokenizer = tokenizer or CLIPTokenizer(
            max_length=text_config.max_position_embeddings,
            vocab_size=text_config.vocab_size,
        )

        self.unet = UNet3D(config=unet_config, dtype=dtype)
        self.vae = AutoencoderKL(config=vae_config, dtype=dtype)
        self.text_encoder = CLIPTextModel(config=text_config, dtype=dtype)
        # optional image conditioning (the fork's pipeline variant,
        # reference: base/pipelines/inference.py:67-629): CLIP vision tower +
        # MappingNetwork whose output is concatenated onto the text states
        self.vision_config = vision_config
        self.vision_encoder = (
            CLIPVisionModel(config=vision_config, dtype=dtype) if vision_config else None
        )
        self.mapping_network = mapping_network

        self.schedule = NoiseSchedule.create(
            sampling.beta_schedule,
            sampling.num_train_timesteps,
            sampling.beta_start,
            sampling.beta_end,
        )
        self._compiled: Dict[Tuple, Any] = {}

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------

    @classmethod
    def init_random(
        cls,
        rng: jax.Array,
        unet_config: UNetConfig = UNetConfig.base_t2v(),
        vae_config: VAEConfig = VAEConfig.sd(),
        text_config: CLIPTextConfig = CLIPTextConfig.vit_l(),
        sampling: SamplingConfig = SamplingConfig(),
        dtype: Any = jnp.bfloat16,
        with_image_conditioning: bool = False,
        vision_config: Optional[CLIPVisionConfig] = None,
    ) -> "TextToVideoPipeline":
        """Randomly-initialized pipeline (no checkpoint), for benchmarking and
        weight-free testing."""
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        unet = UNet3D(config=unet_config, dtype=dtype)
        vae = AutoencoderKL(config=vae_config, dtype=dtype)
        text = CLIPTextModel(config=text_config, dtype=dtype)

        f = vae_config.downscale_factor
        # init spatial size must survive the UNet's 3 downsamples: latent ≥ 8
        s = max(8 * f, 64)
        lat = jnp.zeros((1, 2, s // f, s // f, unet_config.in_channels))
        ctx = jnp.zeros((1, text_config.max_position_embeddings, unet_config.cross_attention_dim))
        # jitted init: one compiled program instead of thousands of op
        # dispatches (critical when the device is behind a network tunnel)
        unet_params = jax.jit(unet.init)(k1, lat, jnp.array([0]), ctx)["params"]
        # init via __call__ so encoder, decoder and both quant convs exist
        vae_params = jax.jit(vae.init)(
            k2, jnp.zeros((1, s, s, vae_config.in_channels))
        )["params"]
        ids = jnp.zeros((1, text_config.max_position_embeddings), dtype=jnp.int32)
        text_params = jax.jit(text.init)(k3, ids)["params"]
        params = {"unet": unet_params, "vae": vae_params, "text_encoder": text_params}

        mapping = None
        if with_image_conditioning:
            if vision_config is None:
                vision_config = (
                    CLIPVisionConfig().tiny()
                    if text_config.hidden_size < 256
                    else CLIPVisionConfig()
                )
            vision = CLIPVisionModel(config=vision_config, dtype=dtype)
            mapping = MappingNetwork(
                input_dim=vision_config.hidden_size,
                output_dim=text_config.hidden_size,
                num_layers=2 if text_config.hidden_size < 256 else 12,
                num_heads=2 if text_config.hidden_size < 256 else 12,
                seq_len_in=vision_config.num_positions,
                seq_len_out=text_config.max_position_embeddings,
                dtype=dtype,
            )
            px = jnp.zeros((1, vision_config.image_size, vision_config.image_size, 3))
            params["vision_encoder"] = jax.jit(vision.init)(k4, px)["params"]
            img_tok = jnp.zeros((1, vision_config.num_positions, vision_config.hidden_size))
            txt_tok = jnp.zeros((1, text_config.max_position_embeddings, text_config.hidden_size))
            params["mapping"] = jax.jit(mapping.init)(k5, img_tok, txt_tok)["params"]
        else:
            vision_config = None

        return cls(
            unet_config, vae_config, text_config, params, sampling, dtype=dtype,
            vision_config=vision_config, mapping_network=mapping,
        )

    # ------------------------------------------------------------------
    # compiled sampler
    # ------------------------------------------------------------------

    def _build_sampler(
        self,
        batch: int,
        video_length: int,
        height: int,
        width: int,
        num_inference_steps: int,
        sample_method: str,
        eta: float,
        decode_chunk: int,
        with_image: bool = False,
        with_text_states: bool = False,
    ):
        """Returns a jitted fn(params, token_ids, init_noise, noise_key,
        guidance_scale) → uint8 video. With `with_text_states`, the second
        argument is the pre-computed (2B, L, D) [uncond; cond] text states
        instead of token ids (parity-harness flow: isolates denoise/decode
        diffs from text-encoder diffs)."""
        cfg = self.sampling
        schedule = self.schedule
        f = self.vae_config.downscale_factor
        lat_h, lat_w = height // f, width // f
        lat_c = self.unet_config.in_channels
        scaling = self.vae_config.scaling_factor
        dtype = self.dtype

        if sample_method == "ddpm":
            ts = ddpm_timesteps(num_inference_steps, cfg.num_train_timesteps)
            pts = prev_timesteps(ts, cfg.num_train_timesteps)
            init_sigma = 1.0
            extras = (jnp.asarray(ts), jnp.asarray(pts))
        elif sample_method == "ddim":
            ts = ddim_timesteps(num_inference_steps, cfg.num_train_timesteps, cfg.steps_offset)
            pts = prev_timesteps(ts, cfg.num_train_timesteps)
            init_sigma = 1.0
            extras = (jnp.asarray(ts), jnp.asarray(pts))
        elif sample_method == "eulerdiscrete":
            ts_f, sigmas, init_sigma = euler_sigmas(
                np.asarray(schedule.alphas_cumprod), num_inference_steps, cfg.num_train_timesteps
            )
            extras = (jnp.asarray(ts_f), jnp.asarray(sigmas))
        else:
            raise NotImplementedError(f"sample_method {sample_method}")

        unet, vae, text_encoder = self.unet, self.vae, self.text_encoder
        prediction_type = cfg.prediction_type
        clip_sample = cfg.clip_sample
        final_ab = (
            None if cfg.set_alpha_to_one else schedule.alphas_cumprod[0]
        )

        vision_encoder = self.vision_encoder
        mapping_network = self.mapping_network

        def sample_fn(params, token_ids, init_noise, noise_key, guidance_scale, image=None):
            # --- text encoding: (2B, 77) [uncond; cond] → (2B, 77, D) ---
            if with_text_states:
                text_states = token_ids.astype(dtype)  # injected states
            else:
                text_states = text_encoder.apply(
                    {"params": params["text_encoder"]}, token_ids
                ).astype(dtype)

            if with_image:
                # image conditioning: CLIP vision tokens → mapper → concat
                # onto BOTH cond and uncond text states
                # (reference: base/pipelines/inference.py:286-349)
                img_states = vision_encoder.apply(
                    {"params": params["vision_encoder"]}, image.astype(dtype)
                )
                img2 = jnp.concatenate([img_states, img_states], axis=0)
                mapped = mapping_network.apply(
                    {"params": params["mapping"]}, img2, text_states
                ).astype(dtype)
                text_states = jnp.concatenate([text_states, mapped], axis=1)

            latents = init_noise * init_sigma

            def unet_eps(x, t_scalar, model_input_scale=None):
                """CFG-doubled UNet evaluation → guided prediction."""
                xin = jnp.concatenate([x, x], axis=0).astype(dtype)
                if model_input_scale is not None:
                    xin = xin * model_input_scale
                t = jnp.broadcast_to(t_scalar, (2 * batch,))
                pred = unet.apply(
                    {"params": params["unet"]}, xin, t, text_states
                ).astype(jnp.float32)
                return classifier_free_guidance(pred, guidance_scale)

            if sample_method in ("ddpm", "ddim"):
                ts_arr, pts_arr = extras

                def body(carry, tp):
                    x, key = carry
                    t, pt = tp
                    eps = unet_eps(x, t)
                    if sample_method == "ddpm":
                        key, sub = jax.random.split(key)
                        noise = jax.random.normal(sub, x.shape, dtype=jnp.float32)
                        x = ddpm_step(
                            schedule, x, eps, t, pt, noise,
                            prediction_type=prediction_type,
                            clip_sample=clip_sample,
                        )
                    else:
                        x = ddim_step(
                            schedule, x, eps, t, pt,
                            prediction_type=prediction_type, eta=0.0,
                            clip_sample=clip_sample,
                            final_alpha_bar=final_ab,
                        )
                    return (x, key), None

                (latents, _), _ = jax.lax.scan(
                    body, (latents.astype(jnp.float32), noise_key), (ts_arr, pts_arr)
                )
            else:  # eulerdiscrete
                ts_arr, sigmas_arr = extras

                def body(x, inp):
                    t, sigma, sigma_next = inp
                    scale = (1.0 / jnp.sqrt(sigma**2 + 1.0)).astype(dtype)
                    eps = unet_eps(x, t, model_input_scale=scale)
                    x = euler_step(x, eps, sigma, sigma_next, prediction_type=prediction_type)
                    return x, None

                latents, _ = jax.lax.scan(
                    body,
                    latents.astype(jnp.float32),
                    (ts_arr, sigmas_arr[:-1], sigmas_arr[1:]),
                )

            # --- VAE decode, frames folded into batch
            # (reference decodes per frame: pipeline_videogen.py:422-429) ---
            z = (latents / scaling).astype(dtype)
            z2d = z.reshape((batch * video_length, lat_h, lat_w, lat_c))

            if decode_chunk and decode_chunk < batch * video_length:
                n = batch * video_length
                chunks = [
                    vae.apply(
                        {"params": params["vae"]},
                        jax.lax.dynamic_slice_in_dim(z2d, i, decode_chunk, 0),
                        method=AutoencoderKL.decode,
                    )
                    for i in range(0, n, decode_chunk)
                ]
                rgb = jnp.concatenate(chunks, axis=0)
            else:
                rgb = vae.apply({"params": params["vae"]}, z2d, method=AutoencoderKL.decode)

            rgb = rgb.astype(jnp.float32)
            video = rgb.reshape(batch, video_length, height, width, 3)
            video = jnp.clip(video / 2.0 + 0.5, 0.0, 1.0)
            return jnp.round(video * 255.0).astype(jnp.uint8)

        return jax.jit(sample_fn)

    # ------------------------------------------------------------------
    # step-level jit variant ("python" loop mode)
    # ------------------------------------------------------------------

    def _build_stepwise(self, batch, video_length, height, width,
                        num_inference_steps, sample_method, decode_chunk,
                        with_image, with_text_states=False):
        cfg = self.sampling
        schedule = self.schedule
        f = self.vae_config.downscale_factor
        lat_h, lat_w = height // f, width // f
        scaling = self.vae_config.scaling_factor
        dtype = self.dtype
        unet, vae, text_encoder = self.unet, self.vae, self.text_encoder
        vision_encoder, mapping_network = self.vision_encoder, self.mapping_network
        prediction_type = cfg.prediction_type
        clip_sample = cfg.clip_sample
        final_ab = (
            None if cfg.set_alpha_to_one else schedule.alphas_cumprod[0]
        )

        if sample_method == "ddpm":
            ts = ddpm_timesteps(num_inference_steps, cfg.num_train_timesteps)
            extras = (ts, prev_timesteps(ts, cfg.num_train_timesteps))
            init_sigma = 1.0
        elif sample_method == "ddim":
            ts = ddim_timesteps(num_inference_steps, cfg.num_train_timesteps, cfg.steps_offset)
            extras = (ts, prev_timesteps(ts, cfg.num_train_timesteps))
            init_sigma = 1.0
        else:
            ts_f, sigmas, init_sigma = euler_sigmas(
                np.asarray(schedule.alphas_cumprod), num_inference_steps, cfg.num_train_timesteps
            )
            extras = (ts_f, sigmas)

        @jax.jit
        def text_fn(params, token_ids, image=None):
            if with_text_states:
                text_states = token_ids.astype(dtype)  # injected states
            else:
                text_states = text_encoder.apply(
                    {"params": params["text_encoder"]}, token_ids
                ).astype(dtype)
            if with_image:
                img_states = vision_encoder.apply(
                    {"params": params["vision_encoder"]}, image.astype(dtype)
                )
                img2 = jnp.concatenate([img_states, img_states], axis=0)
                mapped = mapping_network.apply(
                    {"params": params["mapping"]}, img2, text_states
                ).astype(dtype)
                text_states = jnp.concatenate([text_states, mapped], axis=1)
            return text_states

        def unet_eps(params, x, text_states, t_model, guidance_scale, scale_in):
            xin = (jnp.concatenate([x, x], axis=0) * scale_in).astype(dtype)
            pred = unet.apply(
                {"params": params["unet"]}, xin,
                jnp.broadcast_to(t_model, (2 * batch,)), text_states,
            ).astype(jnp.float32)
            return classifier_free_guidance(pred, guidance_scale)

        if sample_method == "ddpm":
            def _step(params, x, text_states, t, pt, key, guidance):
                eps = unet_eps(params, x, text_states, t, guidance, jnp.float32(1.0))
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, x.shape, dtype=jnp.float32)
                return ddpm_step(schedule, x, eps, t, pt, noise,
                                 prediction_type=prediction_type,
                                 clip_sample=clip_sample), key
        elif sample_method == "ddim":
            def _step(params, x, text_states, t, pt, key, guidance):
                eps = unet_eps(params, x, text_states, t, guidance, jnp.float32(1.0))
                return ddim_step(schedule, x, eps, t, pt,
                                 prediction_type=prediction_type,
                                 clip_sample=clip_sample,
                                 final_alpha_bar=final_ab), key
        else:
            def _step(params, x, text_states, t, sigma, sigma_next, key, guidance):
                scale_in = (1.0 / jnp.sqrt(sigma**2 + 1.0)).astype(jnp.float32)
                eps = unet_eps(params, x, text_states, t, guidance, scale_in)
                return euler_step(x, eps, sigma, sigma_next,
                                  prediction_type=prediction_type), key

        step_fn = jax.jit(_step)

        # loop_mode='hybrid': the denoise loop as scanned K-step chunk
        # programs (the per-chunk timestep tables enter as traced ARGUMENTS so
        # one compiled executable serves every chunk), text encode and decode
        # stay separate programs — per-sample dispatches drop from ~steps+2 to
        # ~steps/K+2 with none of the scan-mode sampler's inlined decode
        # copies. Chunking bounds single-program device time (the remote TPU
        # worker kills ~100 s programs — measured on the VSR scan).
        if sample_method in ("ddpm", "ddim"):
            scan_xs = (jnp.asarray(extras[0], jnp.int32),
                       jnp.asarray(extras[1], jnp.int32))

            @jax.jit
            def denoise_scan_fn(params, x, text_states, key, xs_c, guidance):
                def body(carry, tp):
                    x, key = carry
                    x, key = _step(params, x, text_states, tp[0], tp[1], key, guidance)
                    return (x, key), None

                (x, key), _ = jax.lax.scan(body, (x, key), xs_c)
                return x, key
        else:
            ts_f, sigmas = extras
            scan_xs = (jnp.asarray(ts_f, jnp.float32),
                       jnp.asarray(sigmas[:-1], jnp.float32),
                       jnp.asarray(sigmas[1:], jnp.float32))

            @jax.jit
            def denoise_scan_fn(params, x, text_states, key, xs_c, guidance):
                def body(carry, tss):
                    x, key = carry
                    x, key = _step(params, x, text_states, tss[0], tss[1], tss[2],
                                   key, guidance)
                    return (x, key), None

                (x, key), _ = jax.lax.scan(body, (x, key), xs_c)
                return x, key

        hybrid = self.loop_mode == "hybrid"
        scan_chunk = self.scan_chunk

        @jax.jit
        def decode_fn(params, x):
            z = (x / scaling).astype(dtype).reshape(
                (batch * video_length, lat_h, lat_w, x.shape[-1])
            )
            rgb = vae.apply({"params": params["vae"]}, z, method=AutoencoderKL.decode)
            video = rgb.astype(jnp.float32).reshape(batch, video_length, height, width, 3)
            video = jnp.clip(video / 2.0 + 0.5, 0.0, 1.0)
            return jnp.round(video * 255.0).astype(jnp.uint8)

        def sample_fn(params, token_ids, init_noise, noise_key, guidance, image=None):
            if with_image:
                text_states = text_fn(params, token_ids, image)
            else:
                text_states = text_fn(params, token_ids)
            x = (init_noise * init_sigma).astype(jnp.float32)
            key = noise_key
            if hybrid:
                n = num_inference_steps
                k = scan_chunk if scan_chunk > 0 else n
                for i in range(0, n, k):
                    xs_c = tuple(a[i : i + k] for a in scan_xs)
                    x, key = denoise_scan_fn(params, x, text_states, key,
                                             xs_c, guidance)
            elif sample_method in ("ddpm", "ddim"):
                ts_arr, pts_arr = extras
                for i in range(num_inference_steps):
                    x, key = step_fn(
                        params, x, text_states, jnp.int32(int(ts_arr[i])),
                        jnp.int32(int(pts_arr[i])), key, guidance,
                    )
            else:
                ts_arr, sigmas = extras
                for i in range(num_inference_steps):
                    x, key = step_fn(
                        params, x, text_states, jnp.float32(ts_arr[i]),
                        jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
                        key, guidance,
                    )
            return decode_fn(params, x)

        return sample_fn

    # ------------------------------------------------------------------
    # public API (reference surface: VideoGenPipeline.__call__,
    # reference: base/pipelines/pipeline_videogen.py:512-695)
    # ------------------------------------------------------------------

    def __call__(
        self,
        prompt,
        image: Optional[np.ndarray] = None,
        video_length: Optional[int] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        negative_prompt: str = "",
        sample_method: Optional[str] = None,
        seed: Optional[int] = 0,
        latents: Optional[np.ndarray] = None,
        decode_chunk: int = 0,
        text_states: Optional[np.ndarray] = None,
    ) -> PipelineOutput:
        """`text_states` (2B, L, D) [uncond; cond] bypasses the text encoder
        — the parity-harness flow isolating denoise/decode diffs from
        text-encoder diffs (the reference analog injects prompt_embeds)."""
        cfg = self.sampling
        if latents is not None and video_length is None:
            # injected latents define the sample dims (parity harness flow)
            lat_arr = np.asarray(latents)
            f = self.vae_config.downscale_factor
            video_length = lat_arr.shape[1]
            height = height or lat_arr.shape[2] * f
            width = width or lat_arr.shape[3] * f
        video_length = video_length or cfg.video_length
        height = height or cfg.height
        width = width or cfg.width
        steps = num_inference_steps or cfg.num_inference_steps
        guidance = guidance_scale if guidance_scale is not None else cfg.guidance_scale
        method = sample_method or cfg.sample_method

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        batch = len(prompts)
        with_text_states = text_states is not None
        if with_text_states:
            token_ids = jnp.asarray(text_states)  # (2B, L, D) injected states
            batch = token_ids.shape[0] // 2
        else:
            # [uncond; cond] token batch — uncond first so CFG splits cleanly
            token_ids = jnp.asarray(
                np.concatenate(
                    [self.tokenizer([negative_prompt] * batch), self.tokenizer(prompts)], axis=0
                )
            )

        key = jax.random.PRNGKey(seed if seed is not None else 0)
        lat_key, noise_key = jax.random.split(key)
        f = self.vae_config.downscale_factor
        shape = (batch, video_length, height // f, width // f, self.unet_config.in_channels)
        if latents is None:
            init_noise = jax.random.normal(lat_key, shape, dtype=jnp.float32)
        else:
            # injected latents for per-seed parity with the reference
            # (reference accepts `latents`: pipeline_videogen.py:503-506)
            init_noise = jnp.asarray(latents, dtype=jnp.float32).reshape(shape)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # shard only axes the mesh divides (single-video runs keep batch
            # replicated and shard frames)
            spec = P(
                "dp" if batch % self.mesh.shape.get("dp", 1) == 0 and self.mesh.shape.get("dp", 1) > 1 else None,
                "sp" if video_length % self.mesh.shape.get("sp", 1) == 0 else None,
            )
            init_noise = jax.device_put(init_noise, NamedSharding(self.mesh, spec))

        with_image = image is not None
        if with_image:
            assert self.mapping_network is not None, (
                "image conditioning requires a pipeline built with "
                "with_image_conditioning/vision_config"
            )
            from lavie_tpu.eval.clipsim import clip_preprocess

            img = np.asarray(image)
            if img.dtype == np.uint8:
                img = clip_preprocess(img[None], self.vision_config.image_size)
            elif img.ndim == 3:
                img = img[None]
            img = jnp.asarray(np.broadcast_to(img, (batch,) + img.shape[1:]))

        cache_key = (batch, video_length, height, width, steps, method,
                     decode_chunk, with_image, with_text_states,
                     self.loop_mode, self.scan_chunk)
        if cache_key not in self._compiled:
            if self.loop_mode in ("python", "hybrid"):
                self._compiled[cache_key] = self._build_stepwise(
                    batch, video_length, height, width, steps, method,
                    decode_chunk, with_image, with_text_states,
                )
            else:
                self._compiled[cache_key] = self._build_sampler(
                    batch, video_length, height, width, steps, method, cfg.eta,
                    decode_chunk, with_image=with_image,
                    with_text_states=with_text_states,
                )
        if with_image:
            video = self._compiled[cache_key](
                self.params, token_ids, init_noise, noise_key, jnp.float32(guidance), img
            )
        else:
            video = self._compiled[cache_key](
                self.params, token_ids, init_noise, noise_key, jnp.float32(guidance)
            )
        return PipelineOutput(video=np.asarray(video))
