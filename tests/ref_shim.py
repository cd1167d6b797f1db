"""Import shim for the reference's torch model files.

The reference model sources (`/root/reference/{base,interpolation,vsr}/models/`)
import a handful of diffusers-0.11/0.16-era symbols plus
`rotary_embedding_torch` and `torchvision`, none of which are installed in
this image. Everything they actually *use* is small and its behavior is fully
pinned by public documentation/semantics:

  - ConfigMixin / register_to_config / ModelMixin / BaseOutput — config
    plumbing; register_to_config must record the ctor args as `self.config`
    (reference: base/models/unet.py:101, :409, :440).
  - FeedForward / GEGLU / AdaLayerNorm (diffusers.models.attention) — the
    GEGLU MLP used by every transformer block.
  - Timesteps / TimestepEmbedding (diffusers.models.embeddings) — sinusoidal
    timestep features + 2-layer MLP.
  - RotaryEmbedding (rotary_embedding_torch) — interleaved-pair RoPE applied
    to the first min(32, head_dim) channels of temporal q/k
    (reference: base/models/attention.py:109, :644-646).
  - torchvision.ops.deform_conv2d — only reachable through the VSR
    WarpModule's DCN path, which the shipped config disables; stubbed.

This lets the parity tests run the REFERENCE modules themselves (not
re-implementations of them) against our flax modules with converted weights.

Call `install()` before importing any reference module; `load_ref(stage,
name)` imports e.g. /root/reference/base/models/attention.py as a package
module so its relative imports resolve.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import math
import sys
import types

REFERENCE_ROOT = "/root/reference"

_installed = False


def install() -> None:
    global _installed
    if _installed or "diffusers" in sys.modules and hasattr(
        sys.modules["diffusers"], "__lavie_shim__"
    ):
        _installed = True
        return

    import torch
    import torch.nn.functional as F
    from torch import nn

    # ------------------------------------------------------------------
    # diffusers.configuration_utils
    # ------------------------------------------------------------------
    class FrozenDict(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

    def register_to_config(init):
        import functools
        import inspect

        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {
                k: v
                for k, v in bound.arguments.items()
                if k not in ("self", "args", "kwargs")
            }
            self._internal_dict = FrozenDict(cfg)
            init(self, *args, **kwargs)

        return wrapper

    class ConfigMixin:
        @property
        def config(self):
            return getattr(self, "_internal_dict", FrozenDict())

        @classmethod
        def from_config(cls, config, **kwargs):
            cfg = dict(config)
            cfg.update(kwargs)
            return cls(**cfg)

    class ModelMixin(nn.Module):
        @property
        def dtype(self):
            return next(self.parameters()).dtype

        @property
        def device(self):
            return next(self.parameters()).device

        def enable_gradient_checkpointing(self):
            pass

    # ------------------------------------------------------------------
    # diffusers.utils
    # ------------------------------------------------------------------
    class BaseOutput:
        # reference dataclasses subclass this and only ever read attributes
        pass

    import logging as _pylogging

    class _LoggingShim:
        @staticmethod
        def get_logger(name=None):
            return _pylogging.getLogger(name or "diffusers")

    def is_xformers_available():
        return False

    # ------------------------------------------------------------------
    # diffusers.models.attention: GEGLU / FeedForward / AdaLayerNorm
    # (diffusers 0.11.1 semantics — what the reference vendored against)
    # ------------------------------------------------------------------
    class GEGLU(nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out * 2)

        def forward(self, hidden_states):
            hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
            return hidden_states * F.gelu(gate)

    class GELU(nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out)

        def forward(self, hidden_states):
            return F.gelu(self.proj(hidden_states))

    class FeedForward(nn.Module):
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", final_dropout=False):
            super().__init__()
            inner_dim = int(dim * mult)
            dim_out = dim_out if dim_out is not None else dim
            if activation_fn == "geglu":
                act_fn = GEGLU(dim, inner_dim)
            elif activation_fn == "gelu":
                act_fn = GELU(dim, inner_dim)
            else:
                raise NotImplementedError(activation_fn)
            self.net = nn.ModuleList([act_fn, nn.Dropout(dropout),
                                      nn.Linear(inner_dim, dim_out)])
            if final_dropout:
                self.net.append(nn.Dropout(dropout))

        def forward(self, hidden_states):
            for module in self.net:
                hidden_states = module(hidden_states)
            return hidden_states

    class AdaLayerNorm(nn.Module):
        def __init__(self, embedding_dim, num_embeddings):
            super().__init__()
            self.emb = nn.Embedding(num_embeddings, embedding_dim)
            self.silu = nn.SiLU()
            self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
            self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)

        def forward(self, x, timestep):
            emb = self.linear(self.silu(self.emb(timestep)))
            scale, shift = torch.chunk(emb, 2)
            return self.norm(x) * (1 + scale) + shift

    # ------------------------------------------------------------------
    # diffusers.models.embeddings: Timesteps / TimestepEmbedding
    # ------------------------------------------------------------------
    def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                               downscale_freq_shift=1.0, scale=1.0,
                               max_period=10000):
        half_dim = embedding_dim // 2
        exponent = -math.log(max_period) * torch.arange(
            half_dim, dtype=torch.float32, device=timesteps.device
        )
        exponent = exponent / (half_dim - downscale_freq_shift)
        emb = torch.exp(exponent)
        emb = timesteps[:, None].float() * emb[None, :]
        emb = scale * emb
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if flip_sin_to_cos:
            emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
        if embedding_dim % 2 == 1:
            emb = F.pad(emb, (0, 1, 0, 0))
        return emb

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift

        def forward(self, timesteps):
            return get_timestep_embedding(
                timesteps, self.num_channels,
                flip_sin_to_cos=self.flip_sin_to_cos,
                downscale_freq_shift=self.downscale_freq_shift,
            )

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU() if act_fn == "silu" else None
            self.linear_2 = nn.Linear(
                time_embed_dim, out_dim if out_dim is not None else time_embed_dim
            )

        def forward(self, sample):
            sample = self.linear_1(sample)
            if self.act is not None:
                sample = self.act(sample)
            return self.linear_2(sample)

    # ------------------------------------------------------------------
    # rotary_embedding_torch.RotaryEmbedding (interleaved-pair convention)
    # ------------------------------------------------------------------
    def _rotate_half_interleaved(x):
        # (x0, x1) pairs → (-x1, x0)
        x1 = x[..., 0::2]
        x2 = x[..., 1::2]
        out = torch.stack((-x2, x1), dim=-1)
        return out.reshape(x.shape)

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, theta=10000):
            super().__init__()
            inv_freq = 1.0 / (
                theta ** (torch.arange(0, dim, 2).float() / dim)
            )
            self.register_buffer("inv_freq", inv_freq)

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            seq_len = t.shape[seq_dim]
            freqs = torch.einsum(
                "i,j->ij",
                torch.arange(seq_len, dtype=self.inv_freq.dtype,
                             device=t.device),
                self.inv_freq,
            )
            freqs = freqs.repeat_interleave(2, dim=-1)  # interleaved pairs
            rot_dim = freqs.shape[-1]
            t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
            t_rot = t_rot * freqs.cos() + _rotate_half_interleaved(t_rot) * freqs.sin()
            return torch.cat((t_rot, t_pass), dim=-1)

    # ------------------------------------------------------------------
    # assemble fake modules
    # ------------------------------------------------------------------
    def mod(name, **attrs):
        m = types.ModuleType(name)
        # a real ModuleSpec: modules registered with __spec__=None make
        # importlib.util.find_spec(name) RAISE ValueError — transformers
        # probes find_spec("torchvision") at import, so the bare stub broke
        # any test importing transformers after this shim installed
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    diffusers = mod("diffusers", __lavie_shim__=True)
    diffusers.configuration_utils = mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin, register_to_config=register_to_config,
        FrozenDict=FrozenDict,
    )
    def randn_tensor(shape, generator=None, device=None, dtype=None):
        # diffusers.utils.randn_tensor — reached only by eta>0 DDIM steps
        return torch.randn(tuple(shape), generator=generator, dtype=dtype)

    diffusers.utils = mod(
        "diffusers.utils", BaseOutput=BaseOutput, logging=_LoggingShim(),
        randn_tensor=randn_tensor,
    )
    sys.modules["diffusers.utils"].import_utils = mod(
        "diffusers.utils.import_utils",
        is_xformers_available=is_xformers_available,
    )
    # ------------------------------------------------------------------
    # diffusers.schedulers.scheduling_utils — imported by the vendored
    # vsr/diffusion/scheduling_ddim.py (class bases + a compat-name list)
    # ------------------------------------------------------------------
    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        DDIMScheduler = 1
        DDPMScheduler = 2
        PNDMScheduler = 3
        EulerDiscreteScheduler = 4

    class SchedulerMixin:
        pass

    diffusers.schedulers = mod("diffusers.schedulers")
    diffusers.schedulers.scheduling_utils = mod(
        "diffusers.schedulers.scheduling_utils",
        KarrasDiffusionSchedulers=KarrasDiffusionSchedulers,
        SchedulerMixin=SchedulerMixin,
    )
    diffusers.models = mod("diffusers.models")
    diffusers.models.attention = mod(
        "diffusers.models.attention",
        FeedForward=FeedForward, AdaLayerNorm=AdaLayerNorm, GEGLU=GEGLU,
        GELU=GELU,
    )
    class ImagePositionalEmbeddings(nn.Module):
        # imported by vsr/models/diffusers_attention.py but only reachable
        # through its is_input_vectorized Transformer2D path (unused here)
        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("ImagePositionalEmbeddings stub")

    diffusers.models.embeddings = mod(
        "diffusers.models.embeddings",
        Timesteps=Timesteps, TimestepEmbedding=TimestepEmbedding,
        get_timestep_embedding=get_timestep_embedding,
        ImagePositionalEmbeddings=ImagePositionalEmbeddings,
    )
    diffusers.models.modeling_utils = mod(
        "diffusers.models.modeling_utils", ModelMixin=ModelMixin
    )
    diffusers.models.attention_processor = mod(
        "diffusers.models.attention_processor",
        # imported (aliased) by vsr/models/diffusers_attention.py:28 and
        # vsr/models/temporal_module.py:16 but never instantiated there
        Attention=type("Attention", (nn.Module,), {}),
    )

    mod("rotary_embedding_torch", RotaryEmbedding=RotaryEmbedding)

    if "torchvision" not in sys.modules:
        def _deform_conv2d(*a, **k):
            raise NotImplementedError(
                "deform_conv2d stub — the shipped VSR config disables DCN warp"
            )

        tv = mod("torchvision")
        tv.ops = mod("torchvision.ops", deform_conv2d=_deform_conv2d)

    _installed = True


_PKG_PATHS = {
    "base": f"{REFERENCE_ROOT}/base/models",
    "interpolation": f"{REFERENCE_ROOT}/interpolation/models",
    "vsr": f"{REFERENCE_ROOT}/vsr/models",
    # the vendored diffusers-0.16 DDIM scheduler (vsr/diffusion/) — its
    # `step` body is the stock diffusers step; the base pipeline golden
    # drives it with stock arange spacing (base/pipelines/sample.py:44-60)
    "vsr_diffusion": f"{REFERENCE_ROOT}/vsr/diffusion",
    # the vendored OpenAI GaussianDiffusion/SpacedDiffusion the TSR stage
    # samples with (interpolation/sample.py:162-166) — drives the TSR
    # pipeline-level golden
    "interpolation_diffusion": f"{REFERENCE_ROOT}/interpolation/diffusion",
}


def load_ref(stage: str, name: str):
    """Import /root/reference/<stage>/models/<name>.py as `ref_<stage>.<name>`
    (a synthetic package, so `from .resnet import ...` resolves)."""
    install()
    pkg_name = f"ref_{stage}"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [_PKG_PATHS[stage]]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{name}")
