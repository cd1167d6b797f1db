"""CLIP text encoder in flax.

The reference wraps transformers' torch CLIPTextModel (ViT-L/14) and takes
`last_hidden_state` [B, 77, 768] as the UNet conditioning
(reference: base/models/clip.py:32-58, base/pipelines/pipeline_videogen.py:273-420).
This is the same transformer re-implemented natively: pre-LN blocks, causal
mask, quick-gelu MLP. Param names mirror HF so conversion is a string map.

Also provides CLIPVisionModel (ViT-L/14 vision tower) for the fork's
image-conditioning path (reference: base/pipelines/inference.py:286-292 uses
vision `last_hidden_state` [B, 257, 1024]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.core.config import CLIPTextConfig

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    # "quick_gelu" (OpenAI ViT-L towers) or "gelu" (the x4-upscaler's
    # OpenCLIP-H text encoder sets hidden_act="gelu" in its HF config)
    hidden_act: str = "quick_gelu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dense(self.intermediate_size, name="fc1", **common)(x)
        if self.hidden_act == "quick_gelu":
            x = quick_gelu(x)
        elif self.hidden_act == "gelu":
            x = jax.nn.gelu(x, approximate=False)
        else:
            raise ValueError(f"unknown hidden_act: {self.hidden_act}")
        return nn.Dense(self.hidden_size, name="fc2", **common)(x)


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    causal: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        hd = self.hidden_size // self.num_heads
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(self.hidden_size, name="q_proj", **common)(x)
        k = nn.Dense(self.hidden_size, name="k_proj", **common)(x)
        v = nn.Dense(self.hidden_size, name="v_proj", **common)(x)
        q = q.reshape(b, s, self.num_heads, hd)
        k = k.reshape(b, s, self.num_heads, hd)
        v = v.reshape(b, s, self.num_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (hd**-0.5)
        if self.causal:
            mask = np.triu(np.full((s, s), -1e9, dtype=np.float32), k=1)
            scores = scores + jnp.asarray(mask)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
        return nn.Dense(self.hidden_size, name="out_proj", **common)(out)


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    eps: float = 1e-5
    causal: bool = True
    hidden_act: str = "quick_gelu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(
            epsilon=self.eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name
        )
        h = ln("layer_norm1")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + CLIPAttention(
            self.hidden_size, self.num_heads, causal=self.causal,
            dtype=self.dtype, param_dtype=self.param_dtype, name="self_attn",
        )(h)
        h = ln("layer_norm2")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + CLIPMLP(
            self.hidden_size, self.intermediate_size,
            hidden_act=self.hidden_act,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mlp",
        )(h)
        return x


class CLIPTextModel(nn.Module):
    """Token ids (B, 77) → last_hidden_state (B, 77, hidden)."""

    config: CLIPTextConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=self.param_dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
            self.param_dtype,
        )
        x = (tok + pos[None, : input_ids.shape[1]]).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(
                cfg.hidden_size,
                cfg.num_heads,
                cfg.intermediate_size,
                eps=cfg.layer_norm_eps,
                hidden_act=getattr(cfg, "hidden_act", "quick_gelu"),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="final_layer_norm",
        )(x.astype(jnp.float32))
        return x.astype(self.dtype)


def token_drop(
    token_ids: jnp.ndarray,  # (B, L)
    uncond_ids: jnp.ndarray,  # (L,) or (1, L) — the tokenized empty prompt
    rng: jax.Array,
    drop_prob: float,
    force_drop: Optional[jnp.ndarray] = None,  # (B,) bool overrides
) -> jnp.ndarray:
    """Classifier-free-guidance caption dropout: with probability `drop_prob`
    a sample's prompt tokens are replaced by the empty-prompt tokens
    (reference: TextEmbedder.token_drop base/models/clip.py:70-81, which
    blanks the prompt STRING pre-tokenization; on token ids this is the same
    operation without a host round trip)."""
    b = token_ids.shape[0]
    if force_drop is None:
        drop = jax.random.uniform(rng, (b,)) < drop_prob
    else:
        drop = force_drop.astype(bool)
    uncond = jnp.broadcast_to(jnp.asarray(uncond_ids).reshape(1, -1), token_ids.shape)
    return jnp.where(drop[:, None], uncond, token_ids)


class TextEmbedder(nn.Module):
    """CLIP text encoder + CFG caption dropout for training
    (reference: TextEmbedder base/models/clip.py:61-88)."""

    config: CLIPTextConfig
    dropout_prob: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.text_model = CLIPTextModel(
            config=self.config, dtype=self.dtype, param_dtype=self.param_dtype,
            name="text_model",
        )

    def __call__(
        self,
        token_ids: jnp.ndarray,
        uncond_ids: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        force_drop: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        use_drop = (train and self.dropout_prob > 0) or force_drop is not None
        if use_drop:
            assert uncond_ids is not None, "token_drop needs the empty-prompt ids"
            token_ids = token_drop(
                token_ids, uncond_ids,
                rng if rng is not None else jax.random.PRNGKey(0),
                self.dropout_prob, force_drop,
            )
        return self.text_model(token_ids)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT-L/14: the fork's image-conditioning tower
    (reference: base/pipelines/inference.py:286-292)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    def tiny(self) -> "CLIPVisionConfig":
        return dataclasses.replace(
            self, image_size=28, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64,
        )


class CLIPVisionModel(nn.Module):
    """Pixel values (B, H, W, 3) → last_hidden_state (B, 1+patches, hidden).

    with_post_layernorm additionally applies the transformer's final
    `post_layernorm`. The fork's image-conditioning path consumes the RAW
    last_hidden_state (reference: base/pipelines/inference.py:286-292), so it
    stays off there; the CLIP scoring head pools the post-LN CLS token
    (transformers CLIPVisionTransformer.forward — LayerNorm is per-token, so
    normalizing all tokens then slicing CLS equals HF's pooled_output)."""

    config: CLIPVisionConfig
    with_post_layernorm: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            padding="VALID",
            name="patch_embedding",
            **common,
        )(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,), self.param_dtype
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(patches.dtype), (b, 1, cfg.hidden_size)), patches], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_positions, cfg.hidden_size),
            self.param_dtype,
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="pre_layrnorm",
        )(x.astype(jnp.float32)).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(
                cfg.hidden_size,
                cfg.num_heads,
                cfg.intermediate_size,
                eps=cfg.layer_norm_eps,
                causal=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x)
        if self.with_post_layernorm:
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=jnp.float32, name="post_layernorm",
            )(x.astype(jnp.float32)).astype(self.dtype)
        return x


class CLIPDualEncoder(nn.Module):
    """The CLIP joint text↔image embedding model (transformers CLIPModel):
    EOS-pooled text + `text_projection`, post-LN CLS-pooled vision +
    `visual_projection`. This is the scoring model behind the reference's
    CLIPSIM metric (reference: base/pipelines/fine_tuning.py:860-892,
    evaluation.py:73-83 — both score via CLIP projection embeddings).
    Param names mirror transformers.CLIPModel so conversion is a string map
    (io.convert.convert_clip_dual_encoder)."""

    text_config: CLIPTextConfig
    vision_config: CLIPVisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = CLIPTextModel(
            config=self.text_config, name="text_model", **common
        )
        self.vision_model = CLIPVisionModel(
            config=self.vision_config, with_post_layernorm=True,
            name="vision_model", **common,
        )
        proj = self.text_config.projection_dim
        self.text_projection = nn.Dense(
            proj, use_bias=False, name="text_projection", **common
        )
        self.visual_projection = nn.Dense(
            proj, use_bias=False, name="visual_projection", **common
        )

    def get_text_embeds(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, L) ids → (B, proj) — EOS-pooled (argmax of ids finds the first
        EOS: eot is the highest id in the CLIP vocab, and padding repeats it;
        argmax returns the first occurrence)."""
        hidden = self.text_model(input_ids)
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = hidden[jnp.arange(hidden.shape[0]), eos_idx]
        return self.text_projection(pooled)

    def get_image_embeds(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) → (B, proj) — post-LN CLS pooled."""
        hidden = self.vision_model(pixel_values)
        return self.visual_projection(hidden[:, 0])

    def __call__(self, input_ids: jnp.ndarray, pixel_values: jnp.ndarray):
        return self.get_text_embeds(input_ids), self.get_image_embeds(pixel_values)
