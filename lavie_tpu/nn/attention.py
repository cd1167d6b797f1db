"""Attention modules for the spatio-temporal transformer blocks.

Three attention flavors cover the whole cascade:
  - Attention: spatial self-attention / text cross-attention
    (reference: base/models/attention.py:43-291)
  - TemporalAttention: frame-axis attention, either RoPE + bucketed
    relative-position bias (base/VSR; reference: base/models/attention.py:562-667)
    or BERT-style learned relative positions (interpolation;
    reference: interpolation/models/attention.py:216-244)
  - SparseCausalAttention: per-frame k/v from frames {0, i-1}
    (interpolation; reference: interpolation/models/attention.py:609-665)

All route through lavie_tpu.kernels.dot_product_attention — one fused TPU
entry instead of the reference's eager/sliced/xformers triplet.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from lavie_tpu.kernels import dot_product_attention
from lavie_tpu.nn.embeddings import (
    apply_rope_half,
    relative_position_buckets,
    rope_half_frequencies,
)

Dtype = Any


class Attention(nn.Module):
    """Multi-head attention with diffusers-style projection names
    (to_q/to_k/to_v/to_out.0) so weight conversion is a string map."""

    query_dim: int
    heads: int = 8
    head_dim: int = 64
    cross_attention_dim: Optional[int] = None  # None → self-attention
    out_zero_init: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.head_dim
        dense = lambda feats, name, zero=False: nn.Dense(
            feats,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
            name=name,
        )
        self.to_q = dense(inner, "to_q")
        self.to_k = dense(inner, "to_k")
        self.to_v = dense(inner, "to_v")
        # out projection has a bias in diffusers
        self.to_out_0 = nn.Dense(
            self.query_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros if self.out_zero_init else nn.initializers.lecun_normal(),
            name="to_out_0",
        )

    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, S, C)
        encoder_hidden_states: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        b, s, _ = hidden_states.shape
        sk = context.shape[1]
        q = self.to_q(hidden_states).reshape(b, s, self.heads, self.head_dim)
        k = self.to_k(context).reshape(b, sk, self.heads, self.head_dim)
        v = self.to_v(context).reshape(b, sk, self.heads, self.head_dim)
        out = dot_product_attention(q, k, v)
        out = out.reshape(b, s, self.heads * self.head_dim)
        return self.to_out_0(out)


class RelativePositionBias(nn.Module):
    """Learned bucketed relative-position bias added to temporal attention
    scores (reference: base/models/attention.py:669-707)."""

    heads: int
    num_buckets: int = 32
    max_distance: int = 32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, n: int) -> jnp.ndarray:
        buckets = jnp.asarray(
            relative_position_buckets(n, self.num_buckets, self.max_distance)
        )
        values = nn.Embed(
            self.num_buckets,
            self.heads,
            param_dtype=self.param_dtype,
            name="relative_attention_bias",
        )(buckets)  # (n, n, heads)
        return jnp.transpose(values, (2, 0, 1))  # (heads, n, n)


class TemporalAttention(nn.Module):
    """Attention over the frame axis, (B·H·W, F, C) rows.

    variant="rope_relbias": partial RoPE on q/k + learned relative-position
      bias added to the scores — the base/VSR temporal attention.
    variant="plain": vanilla attention over frames — the SHIPPED interpolation
      temporal attention: TSR's from_pretrained_2d never sets
      use_relative_position, so it stays False
      (reference: interpolation/models/unet.py:100, :477-558 — the config
      plumbs no such key) and attn_temp is a bare CrossAttention.
    variant="learned_relpos": BERT-style learned relative position embeddings
      contracted with q and k — the reference's OPTIONAL (dead in the shipped
      path) relative-position code. Its score normalization reproduces the
      reference quirk of applying the 1/sqrt(d) scale twice to the q·k term
      (reference: interpolation/models/attention.py:225-245). Distances are
      clamped to the 32-position table; the reference's torch.nn.Embedding
      would index out of range beyond 32 frames.
    """

    query_dim: int
    heads: int = 8
    head_dim: int = 64
    variant: str = "rope_relbias"
    rope_dim: int = 32
    num_buckets: int = 32
    max_distance: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.head_dim
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        self.to_q = dense(inner, "to_q")
        self.to_k = dense(inner, "to_k")
        self.to_v = dense(inner, "to_v")
        # zero-initialized out projection: at init the temporal residual is a
        # no-op, preserving the pretrained 2D behavior
        # (reference: base/models/attention.py:475)
        self.to_out_0 = nn.Dense(
            self.query_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros,
            name="to_out_0",
        )
        if self.variant == "rope_relbias":
            self.time_rel_pos_bias = RelativePositionBias(
                heads=self.heads,
                num_buckets=self.num_buckets,
                max_distance=self.max_distance,
                param_dtype=self.param_dtype,
                name="time_rel_pos_bias",
            )
        elif self.variant == "learned_relpos":
            self.max_position_embeddings = 32
            self.distance_embedding = nn.Embed(
                2 * 32 - 1,
                self.head_dim,
                param_dtype=self.param_dtype,
                name="distance_embedding",
            )
        elif self.variant != "plain":
            raise ValueError(f"unknown temporal attention variant: {self.variant}")

    def channel_major_supported(self, frames: int, s: int) -> bool:
        """True when the channel-major fused kernel (kernels/temporal_fused)
        should take the (B, F, S, C) layout directly. Default-ON where
        supported (hg ≥ 2, i.e. head_dim ≤ 64): with fp32-staged k/v the
        kernel beats XLA at every such cascade shape (VSR L1 20.0 vs 23.3,
        L2 7.4 vs 8.3, base L0 7.3 vs 13.1 ms) and the channel-major
        projections remove the layout copies around the XLA path. Disable
        with LAVIE_TEMPORAL_FUSED=0."""
        import os

        if os.environ.get("LAVIE_TEMPORAL_FUSED", "1") != "1":
            return False
        if os.environ.get("LAVIE_DISABLE_FLASH") == "1":
            return False
        if self.variant not in ("rope_relbias", "plain"):
            return False
        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.temporal_fused import temporal_fused_supported

        return _on_tpu() and temporal_fused_supported(
            frames, self.heads, self.head_dim, s
        )

    def channel_major(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        """Fused path over (B, F, S, C): the projections are emitted with the
        CHANNEL dimension leading — q^T = W^T·x^T is the same GEMM with the
        output order flipped, so the (b f) s c ↔ (b s) f c transposes of the
        standard path never materialize.
        """
        import jax

        from lavie_tpu.kernels.temporal_fused import (
            pick_layout,
            rope_tables_cmajor,
            temporal_attention_cmajor,
        )

        b, f, s, c = hidden_states.shape
        _, hg = pick_layout(c, f, s, self.heads)

        # three separate GEMMs, NOT a fused (3E,C) qkv projection: measured
        # (VSR L1) the fused variant costs 9.2 ms dot + 3.0 ms for the q/k/v
        # slices — XLA materializes the slice copies to feed the pallas call
        # — vs 7.8 ms for separate projections writing kernel inputs directly
        def proj_cm(dense):  # (B,F,S,C) × (C,E) → (E,B,F,S)
            w = dense.variables["params"]["kernel"].astype(self.dtype)
            return jax.lax.dot_general(
                w.T, hidden_states, (((1,), (3,)), ((), ()))
            )

        q = proj_cm(self.to_q)
        k = proj_cm(self.to_k)
        v = proj_cm(self.to_v)

        if self.variant == "rope_relbias":
            rot = min(self.rope_dim, self.head_dim)
            cos_np, sin_np = rope_half_frequencies(f, rot)
            cs = jnp.asarray(
                rope_tables_cmajor(
                    f, self.heads, self.head_dim, rot, hg, cos_np, sin_np
                )
            )
            bias = self.time_rel_pos_bias(f)  # (H, F, F)
        else:  # plain
            rot = 0
            cs = jnp.ones((c, 2 * f), jnp.float32)
            bias = None

        out = temporal_attention_cmajor(
            q, k, v, bias, cs,
            heads=self.heads, scale=self.head_dim**-0.5, rope_dim=rot,
        )  # (E, B, F, S), permuted basis

        # out-projection consumes channel-major directly: (E,B,F,S)·(E,O)
        wo = self.to_out_0.variables["params"]["kernel"].astype(self.dtype)
        bo = self.to_out_0.variables["params"]["bias"].astype(self.dtype)
        y = jax.lax.dot_general(out, wo, (((0,), (0,)), ((), ())))
        return y + bo

    def folded_supported(self, frames: int, s: int) -> bool:
        """True when the fused Pallas temporal kernel should take the
        (B, F, S, C) layout directly. OPT-IN (LAVIE_TEMPORAL_KERNEL=1):
        measured on v5e the strictly-2D Mosaic formulation runs ~3× slower
        than XLA's fused path (34 vs 12 ms at the base L0 shape) — the
        per-head indicator matmuls are 2·F² tiny MXU dots per tile. XLA's
        layout is the production path; the kernel is kept as a correct,
        tested baseline for future Mosaic work."""
        import os

        if os.environ.get("LAVIE_TEMPORAL_KERNEL") != "1":
            return False
        if os.environ.get("LAVIE_DISABLE_FLASH") == "1":
            return False
        if self.variant != "rope_relbias":
            return False
        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.temporal_attention import temporal_supported_shape

        return _on_tpu() and temporal_supported_shape(
            frames, self.heads, self.head_dim, s
        )

    def folded(self, hidden_states: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        """Fused path over (B, F, S, C) — frame-axis attention with RoPE +
        rel-pos bias, positions-on-lanes Pallas kernel
        (kernels/temporal_attention.py)."""
        b, f, s, _ = hidden_states.shape
        shape5 = (b, f, s, self.heads, self.head_dim)
        q = self.to_q(hidden_states).reshape(shape5)
        k = self.to_k(hidden_states).reshape(shape5)
        v = self.to_v(hidden_states).reshape(shape5)
        cos_np, sin_np = rope_half_frequencies(f, min(self.rope_dim, self.head_dim))
        # (f, 1, 1, rot/2) right-aligns onto the frame axis of (b,f,s,h,d)
        cos = jnp.asarray(cos_np, dtype=q.dtype)[:, None, None, :]
        sin = jnp.asarray(sin_np, dtype=q.dtype)[:, None, None, :]
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        bias = self.time_rel_pos_bias(f)  # (heads, f, f)
        from lavie_tpu.kernels.temporal_attention import temporal_attention

        out = temporal_attention(
            q, k, v, bias, scale=self.head_dim**-0.5, interpret=interpret
        )
        out = out.reshape(b, f, s, self.heads * self.head_dim)
        return self.to_out_0(out)

    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        b, f, _ = hidden_states.shape
        q = self.to_q(hidden_states).reshape(b, f, self.heads, self.head_dim)
        k = self.to_k(hidden_states).reshape(b, f, self.heads, self.head_dim)
        v = self.to_v(hidden_states).reshape(b, f, self.heads, self.head_dim)

        if self.variant == "rope_relbias":
            # half-split RoPE: channels are in the permuted (half-split)
            # basis — torch checkpoints get their to_q/to_k columns permuted
            # by the converter (io.convert.permute_rope_channels); freshly
            # initialized/trained weights simply live in this basis
            cos_np, sin_np = rope_half_frequencies(f, min(self.rope_dim, self.head_dim))
            cos = jnp.asarray(cos_np, dtype=q.dtype)[:, None, :]  # (f, 1, rot/2)
            sin = jnp.asarray(sin_np, dtype=q.dtype)[:, None, :]
            q = apply_rope_half(q, cos, sin)
            k = apply_rope_half(k, cos, sin)
            bias = self.time_rel_pos_bias(f)  # (heads, f, f)
            out = dot_product_attention(q, k, v, bias=bias)
        elif self.variant == "plain":
            out = dot_product_attention(q, k, v)
        else:
            # BERT-style: scores = (q·kᵀ·d^-0.5 + q·E + k·E) / sqrt(d)
            scale = self.head_dim**-0.5
            qh = jnp.einsum("bfhd->bhfd", q).astype(jnp.float32)
            kh = jnp.einsum("bfhd->bhfd", k).astype(jnp.float32)
            scores = scale * jnp.einsum("bhld,bhrd->bhlr", qh, kh)
            # clamp to the table range: the reference's 32-position embedding
            # cannot index beyond 32 frames (torch would raise; jnp.take would
            # NaN-fill) — clamping saturates far distances like T5 bucketing
            dist = np.arange(f)[:, None] - np.arange(f)[None, :]
            dist = np.clip(
                dist,
                -(self.max_position_embeddings - 1),
                self.max_position_embeddings - 1,
            )
            emb = self.distance_embedding(
                jnp.asarray(dist + self.max_position_embeddings - 1)
            ).astype(jnp.float32)  # (f, f, d)
            scores = scores + jnp.einsum("bhld,lrd->bhlr", qh, emb)
            scores = scores + jnp.einsum("bhrd,lrd->bhlr", kh, emb)
            scores = scores / np.sqrt(self.head_dim)
            probs = nn.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhlr,brhd->blhd", probs, v)

        out = out.reshape(b, f, self.heads * self.head_dim)
        return self.to_out_0(out)


class SparseCausalAttention(nn.Module):
    """First-frame-anchored cross-frame attention: each frame's k/v tokens are
    the concatenation of frame 0's and frame i-1's tokens
    (reference: interpolation/models/attention.py:629-639).

    Input is spatially folded (B·F, S, C); `video_length` recovers the frame
    axis statically.
    """

    query_dim: int
    heads: int = 8
    head_dim: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.head_dim
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        self.to_q = dense(inner, "to_q")
        self.to_k = dense(inner, "to_k")
        self.to_v = dense(inner, "to_v")
        self.to_out_0 = nn.Dense(
            self.query_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="to_out_0"
        )

    def cmajor_supported(self, s: int) -> bool:
        """Channel-major fused path gate (kernels/flash_attention.flash_cmajor):
        projections emit (B·F, C, S) directly — no (b f h) s d transposes —
        and the kernel's transposed blocks kill the row-major pv matmul's
        padded output lanes (d=40 → 128) and move the softmax reductions to
        the cheap sublane direction. Disable with LAVIE_FLASH_CMAJOR=0."""
        import os

        if os.environ.get("LAVIE_FLASH_CMAJOR", "1") != "1":
            return False
        if os.environ.get("LAVIE_DISABLE_FLASH") == "1":
            return False
        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.flash_attention import flash_cmajor_supported

        return _on_tpu() and flash_cmajor_supported(
            self.heads, self.head_dim, s, 2 * s
        )

    def cmajor(self, hidden_states: jnp.ndarray, video_length: int) -> jnp.ndarray:
        """Channel-major sparse-causal attention over (B·F, S, C) input."""
        import jax

        bf, s, _ = hidden_states.shape
        f = video_length
        b = bf // f
        e = self.heads * self.head_dim

        def proj_cm(dense):  # (BF, S, C) × (C, E) → (BF, E, S)
            w = dense.variables["params"]["kernel"].astype(self.dtype)
            out = jax.lax.dot_general(
                w.T, hidden_states, (((1,), (2,)), ((), ()))
            )  # (E, BF, S) — M=E on the GEMM output sublanes
            return jnp.transpose(out, (1, 0, 2))  # bitcast of the tiled layout

        q = proj_cm(self.to_q)
        k = proj_cm(self.to_k)
        v = proj_cm(self.to_v)

        import os

        from lavie_tpu.kernels.flash_attention import flash_cmajor, flash_cmajor_sparse

        if os.environ.get("LAVIE_SPARSE_HOIST", "1") == "1":
            # NOTE: this env read happens inside a TRACED method — under an
            # outer jit the flag freezes at first trace; set it before the
            # process's first forward (process-level switch), later changes
            # are silently ignored for already-compiled shapes.
            # DEFAULT-ON copy-free kv (r5): the kernel's block index maps
            # synthesize the concat(frame 0, frame i-1) kv straight from
            # the raw per-frame projections — no (BF, E, 2S) anchor/prev
            # materialization (bit-identical block order;
            # tests/test_flash_attention.py::TestFlashCmajorSparse).
            # The r4 ">27 min remote-compile hang" attributed to these
            # index maps did NOT reproduce in round 5: a minimal scan
            # repro (tools/repro_sparse_hoist.py) compiles in seconds at
            # tiny AND production shapes, and the full production TSR
            # hybrid chunk compiled in ~2 min cold and ran (warm sample
            # 50.5 s) — the hang was transient compiler-service state.
            # LAVIE_SPARSE_HOIST=0 restores the materialized path.
            out = flash_cmajor_sparse(
                q, k, v, frames=f,
                heads=self.heads, scale=self.head_dim**-0.5,
            )  # (BF, E, S)
        else:
            def sparse_cm(x):  # kv tokens = concat(frame 0, frame i-1) per frame
                x = x.reshape(b, f, e, s)
                anchor = jnp.broadcast_to(x[:, 0:1], x.shape)
                prev = jnp.concatenate([x[:, 0:1], x[:, :-1]], axis=1)
                return jnp.concatenate([anchor, prev], axis=3).reshape(bf, e, 2 * s)

            out = flash_cmajor(
                q, sparse_cm(k), sparse_cm(v),
                heads=self.heads, scale=self.head_dim**-0.5,
            )  # (BF, E, S)
        # out-projection consumes channel-major directly: contract E off the
        # sublane dim → (BF, S, C)
        wo = self.to_out_0.variables["params"]["kernel"].astype(self.dtype)
        bo = self.to_out_0.variables["params"]["bias"].astype(self.dtype)
        y = jax.lax.dot_general(out, wo, (((1,), (0,)), ((), ())))
        return y + bo

    def __call__(self, hidden_states: jnp.ndarray, video_length: int) -> jnp.ndarray:
        bf, s, _ = hidden_states.shape
        f = video_length
        b = bf // f
        if not self.is_initializing() and self.cmajor_supported(s):
            return self.cmajor(hidden_states, video_length)
        q = self.to_q(hidden_states)
        k = self.to_k(hidden_states)
        v = self.to_v(hidden_states)

        def gather_sparse(x):
            # broadcast/shift instead of index gathers: repeated-index gathers
            # at f=61, S=2560 crash the TPU compiler; these lower to plain
            # broadcasts and a roll-like concat
            x = x.reshape(b, f, s, -1)
            anchor = jnp.broadcast_to(x[:, 0:1], x.shape)  # frame 0 per frame
            prev = jnp.concatenate([x[:, 0:1], x[:, :-1]], axis=1)  # frame i-1
            return jnp.concatenate([anchor, prev], axis=2).reshape(bf, 2 * s, -1)

        k = gather_sparse(k)
        v = gather_sparse(v)
        q = q.reshape(bf, s, self.heads, self.head_dim)
        k = k.reshape(bf, 2 * s, self.heads, self.head_dim)
        v = v.reshape(bf, 2 * s, self.heads, self.head_dim)
        # at 61 frames the fp32 score matrix is ~25 GB — force the flash
        # kernel (padding waste beats not fitting) whenever shapes allow
        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.flash_attention import flash_supported_shape

        impl = (
            "flash"
            if _on_tpu() and flash_supported_shape(q, k, allow_padding=True)
            else "xla"
        )
        out = dot_product_attention(q, k, v, implementation=impl)
        out = out.reshape(bf, s, self.heads * self.head_dim)
        return self.to_out_0(out)
