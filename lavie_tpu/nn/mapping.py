"""MappingNetwork — CLIP image tokens → CLIP text-embedding space.

The fork's image-conditioning head (reference: base/pipelines/mapping.py:61-97):
project ViT-L vision last_hidden_state [B, 257, 1024] to 768-d, add learned
positional embeddings, and run a 12-layer torch-style TransformerDecoder with
a learned 77-token query sequence → [B, 77, 768] states concatenated onto the
text conditioning (reference: base/pipelines/inference.py:295-306).

torch.nn.TransformerDecoderLayer semantics reproduced: post-LayerNorm,
self-attn → cross-attn → 2048-d ReLU FFN, all with biases.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _MHA(nn.Module):
    """torch.nn.MultiheadAttention equivalent (in/out proj with bias)."""

    dim: int
    heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value):
        d = self.dim // self.heads
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, sq, _ = query.shape
        sk = key.shape[1]
        q = nn.Dense(self.dim, name="q_proj", **common)(query)
        k = nn.Dense(self.dim, name="k_proj", **common)(key)
        v = nn.Dense(self.dim, name="v_proj", **common)(value)
        q = q.reshape(b, sq, self.heads, d)
        k = k.reshape(b, sk, self.heads, d)
        v = v.reshape(b, sk, self.heads, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s * (d**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, sq, self.dim)
        return nn.Dense(self.dim, name="out_proj", **common)(out)


class TransformerDecoderLayer(nn.Module):
    dim: int
    heads: int
    ffn_dim: int = 2048
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name
        )
        # post-norm (torch default norm_first=False)
        x = tgt + _MHA(self.dim, self.heads, name="self_attn", **common)(tgt, tgt, tgt)
        x = ln("norm1")(x.astype(jnp.float32)).astype(tgt.dtype)
        x = x + _MHA(self.dim, self.heads, name="multihead_attn", **common)(x, memory, memory)
        x = ln("norm2")(x.astype(jnp.float32)).astype(tgt.dtype)
        h = nn.Dense(self.ffn_dim, name="linear1", **common)(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="linear2", **common)(h)
        x = ln("norm3")((x + h).astype(jnp.float32)).astype(tgt.dtype)
        return x


class MappingNetwork(nn.Module):
    input_dim: int = 1024
    output_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    seq_len_in: int = 257
    seq_len_out: int = 77
    ffn_dim: int = 2048  # torch TransformerDecoderLayer default
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray, text_embeds: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mem = nn.Dense(self.output_dim, name="image_proj", **common)(image_embeds)
        img_pos = self.param(
            "image_pos_embedding", nn.initializers.normal(1.0),
            (1, self.seq_len_in, self.output_dim), self.param_dtype,
        )
        txt_pos = self.param(
            "text_pos_embedding", nn.initializers.normal(1.0),
            (1, self.seq_len_out, self.output_dim), self.param_dtype,
        )
        mem = mem + img_pos.astype(mem.dtype)
        tgt = text_embeds + txt_pos.astype(text_embeds.dtype)
        for i in range(self.num_layers):
            tgt = TransformerDecoderLayer(
                self.output_dim, self.num_heads, ffn_dim=self.ffn_dim,
                name=f"layers_{i}", **common,
            )(tgt, mem)
        return tgt

    def tiny_config(self):
        return dict(input_dim=32, output_dim=32, num_layers=2, num_heads=2,
                    seq_len_in=5, seq_len_out=4)
