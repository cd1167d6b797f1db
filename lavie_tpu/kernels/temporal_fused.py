"""Channel-major fused temporal attention (v2 kernel).

The frame-axis attention (reference: base/models/attention.py:562-667) is
millions of tiny (f×d)·(d×f) problems — one per spatial position per head.
The XLA lowering keeps frames in the two minor dims, so every score tile is
(f, f) inside an (8, 128) register: at f=8 that is 6% lane utilization, and
the trace shows the whole phase spending its time in transposes,
max-subtraction and reduction passes over the padded layout (208 ms of a
1.09 s full-size VSR UNet forward).

This kernel keeps CHANNELS ON SUBLANES and SPATIAL POSITIONS ON LANES:

  - inputs are (C, B, F, S) "channel-major" tensors. The surrounding
    projections produce/consume this layout FOR FREE: q^T = W^T·x^T is the
    same GEMM with the output dimension order flipped, so no transpose pass
    ever materializes (see nn.attention.TemporalAttention).
  - per (head, i, j) the d-dim score reduction is a halving tree of
    full-width sublane adds over the head's contiguous (d, S) rows — the
    cheap VPU direction — and probs·V is a sublane-broadcast multiply.
  - scores/softmax live as (1, S_blk) fp32 rows per (head, i, j) — exact
    max-subtracted softmax, nothing round-trips HBM.
  - wide channel counts split heads over a third grid dimension.

Everything is strictly 2D for Mosaic; no indicator matmuls (the v1 kernel in
temporal_attention.py burned its time in 2·F² tiny MXU dots) and no
>2D multi_reductions (Mosaic rejects them).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    q_ref,  # (Cg, 1, F, S_blk) — one head group (contiguous heads)
    k_ref,
    v_ref,
    bias_ref,  # (1, F·Hg·F, 128) fp32: rows (i·Hg+h)·F + j
    qcs_ref,  # (Cg, 2·F) fp32: [:, :F] = cos, [:, F:] = sin
    kcs_ref,
    o_ref,  # (Cg, 1, F, S_blk)
    *,
    frames: int,
    heads: int,  # heads in this group (Hg)
    head_dim: int,
    rope_dim: int,
    scale: float,
):
    f, hg, d = frames, heads, head_dim
    r, r2 = rope_dim, rope_dim // 2

    def rope_head(ref, i, h, cs_ref):
        # bf16 staging (the XLA path applies rope in the input dtype too)
        x = ref[h * d : (h + 1) * d, 0, i, :]  # (d, S)
        if r2 == 0:
            return x
        cos = cs_ref[h * d : (h + 1) * d, i : i + 1].astype(x.dtype)  # (d, 1)
        sin = cs_ref[h * d : (h + 1) * d, f + i : f + i + 1].astype(x.dtype)
        parts = [-x[r2:r], x[:r2]]
        if d > r:
            parts.append(x[r:])
        return x * cos + jnp.concatenate(parts, axis=0) * sin

    # k and v are used by every query frame: stage k's rope and both fp32
    # converts ONCE (re-converting bf16→fp32 per use costs f extra convert
    # passes per tensor). q is rope'd lazily inside the i-loop.
    ks = [
        [rope_head(k_ref, j, h, kcs_ref).astype(jnp.float32) for h in range(hg)]
        for j in range(f)
    ]
    vs = [
        [v_ref[h * d : (h + 1) * d, 0, j, :].astype(jnp.float32) for h in range(hg)]
        for j in range(f)
    ]

    def tree_sum(x):  # (d, S) → (1, S): halving tree of full-width adds
        n = x.shape[0]
        while n > 1:
            if n % 2:  # fold the odd tail row into row 0
                x = jnp.concatenate([x[:1] + x[n - 1 : n], x[1 : n - 1]], axis=0)
                n -= 1
            half = n // 2
            x = x[:half] + x[half:n]
            n = half
        return x

    for i in range(f):
        for h in range(hg):
            qih = rope_head(q_ref, i, h, qcs_ref).astype(jnp.float32)
            base = (i * hg + h) * f
            rows = []
            for j in range(f):
                prod = qih * ks[j][h]  # (d, S) fp32
                # NB a jnp.sum(axis=0) here crashes the Mosaic compiler
                # (tpu_compile_helper exit 1) — the manual tree stays
                rows.append(
                    tree_sum(prod) * scale
                    + bias_ref[0, base + j : base + j + 1, 0:1]
                )  # (1, S)
            # per-row softmax: a packed (f, S)-tile variant (concat rows,
            # 2D sublane reductions) measured SLOWER (29.1 vs 24.3 ms at
            # VSR L1) — Mosaic's cross-sublane concat costs more than f
            # single-sublane ops save
            m = rows[0]
            for j in range(1, f):
                m = jnp.maximum(m, rows[j])
            exps = [jnp.exp(rr - m) for rr in rows]
            den = exps[0]
            for j in range(1, f):
                den = den + exps[j]
            inv = 1.0 / den
            acc = None
            for j in range(f):
                p = exps[j] * inv  # (1, S) fp32 — broadcasts over d sublanes
                t = p * vs[j][h]
                acc = t if acc is None else acc + t
            o_ref[h * d : (h + 1) * d, 0, i, :] = acc.astype(o_ref.dtype)


def _kernel_v4(
    q_ref,  # (Cg, 1, F, S_blk) — one head group (contiguous heads)
    k_ref,
    v_ref,
    bias_ref,  # (1, F·Hg·F, 128) fp32: rows (i·Hg+h)·F + j
    qcs_ref,  # (Cg, 2·F) fp32: [:, :F] = cos, [:, F:] = sin
    kcs_ref,
    o_ref,  # (Cg, 1, F, S_blk)
    *,
    frames: int,
    heads: int,  # heads in this group (Hg)
    head_dim: int,
    rope_dim: int,
    scale: float,
):
    """v4: same math as _kernel, but every step works on the refs' NATURAL
    (d, F, S) sub-layout — rope/convert staging is one op over the whole
    head slice, each query frame's scores come from ONE (d,F,S) multiply +
    a log₂d leading-dim halving tree (all key frames at once), and probs·V
    is one broadcast multiply + a log₂f within-tile tree. The v2 kernel
    issues ~f²·(d/8) separate (rows, S) VPU ops per (i, h); v4 issues
    ~4·d/8·log f — fewer, full-width ops.

    A v3 that stacked per-frame (d, S) slices into (f, d, S) arrays measured
    SLOWER than v2 (31.5 vs 20.0 ms at VSR L1): each jnp.stack of f strided
    tile rows is a Mosaic relayout pass that outweighs the op-count savings.
    v4 never reorders — (d, F, S) is exactly how the data already sits in
    the (Cg, 1, F, S) block."""
    f, hg, d = frames, heads, head_dim
    r, r2 = rope_dim, rope_dim // 2

    def rope_all(ref, h, cs_ref):
        # whole-head staging: rope in the input dtype (parity with the XLA
        # path), then ONE convert to fp32
        x = ref[h * d : (h + 1) * d, 0]  # (d, F, S) — contiguous slice
        if r2 == 0:
            return x.astype(jnp.float32)
        # minor-dim insertion must happen on the fp32 table (Mosaic: "minor
        # dim insertion only supported for 32-bit types"), THEN cast to the
        # input dtype so rope math matches the XLA path / v2 kernel
        cos = cs_ref[h * d : (h + 1) * d, :f][:, :, None].astype(x.dtype)
        sin = cs_ref[h * d : (h + 1) * d, f : 2 * f][:, :, None].astype(x.dtype)
        parts = [-x[r2:r], x[:r2]]
        if d > r:
            parts.append(x[r:])
        rot = jnp.concatenate(parts, axis=0)  # (d, F, S)
        return (x * cos + rot * sin).astype(jnp.float32)

    for h in range(hg):
        qs = rope_all(q_ref, h, qcs_ref)  # (d, F, S) fp32
        ks = rope_all(k_ref, h, kcs_ref)
        vs = v_ref[h * d : (h + 1) * d, 0].astype(jnp.float32)
        for i in range(f):
            prod = ks * qs[:, i : i + 1, :]  # (d, F, S) — all key frames
            # d-reduction: halving tree on the leading dim (d power of 2 is
            # guaranteed by the v4 gate; a jnp.sum here crashes Mosaic)
            t = prod
            n = d
            while n > 1:
                half = n // 2
                t = t[:half] + t[half:n]
                n = half
            base = (i * hg + h) * f
            scores = t[0] * scale + bias_ref[0, base : base + f, 0:1]  # (F, S)
            # softmax over the F sublane dim (f power of 2 per the gate)
            m = scores
            n = f
            while n > 1:
                half = n // 2
                m = jnp.maximum(m[:half], m[half:n])
                n = half
            e = jnp.exp(scores - m)
            den = e
            n = f
            while n > 1:
                half = n // 2
                den = den[:half] + den[half:n]
                n = half
            pv = vs * (e * (1.0 / den))[None]  # (d, F, S)
            n = f
            while n > 1:
                half = n // 2
                pv = pv[:, :half] + pv[:, half:n]
                n = half
            o_ref[h * d : (h + 1) * d, 0, i, :] = pv[:, 0].astype(o_ref.dtype)


def _kernel_v5(
    q_ref,  # (1, F, Cg, S_blk) — GEMM-NATIVE: channels on SUBLANES
    k_ref,
    v_ref,
    bias_ref,  # (1, F·Hg·F, 128) fp32: rows (i·Hg+h)·F + j
    qcs_ref,  # (1, 2·F, 128) fp32 per-group: [:F] = cos, [F:] = sin,
    kcs_ref,  # lane-padded from Cg to 128 (padding never read)
    o_ref,  # (1, F, Cg, S_blk)
    *,
    frames: int,
    heads: int,  # heads in this group (Hg)
    head_dim: int,
    rope_dim: int,
    scale: float,
):
    """v5: same math as v4, but the block layout matches the surrounding
    GEMMs. The projections' MXU output puts the M dim (channels) on
    SUBLANES — v2/v4's (Cg, 1, F, S) row-major blocks put FRAMES there, so
    XLA inserts a full q/k/v retiling copy before every call (measured
    20.5 ms/fwd across the VSR UNet) and re-tiles the output again for the
    out-projection. v5 takes (1, F, Cg, S) blocks — a free BITCAST of the
    GEMM layout — swapping the axis roles in-kernel: the d-reduction becomes
    a sublane halving tree, softmax and the probs·V reduction move to the
    (cheap) leading frame dim."""
    f, hg, d = frames, heads, head_dim
    r, r2 = rope_dim, rope_dim // 2

    def rope_all(ref, h, cs_ref):
        x = ref[0, :, h * d : (h + 1) * d, :]  # (F, d, S) — sublane slice
        if r2 == 0:
            return x.astype(jnp.float32)
        # minor insertion on the fp32 table, then cast (rope math in the
        # input dtype — parity with the XLA path / v2 / v4)
        cos = cs_ref[0, :f, h * d : (h + 1) * d][:, :, None].astype(x.dtype)
        sin = cs_ref[0, f : 2 * f, h * d : (h + 1) * d][:, :, None].astype(x.dtype)
        parts = [-x[:, r2:r], x[:, :r2]]
        if d > r:
            parts.append(x[:, r:])
        rot = jnp.concatenate(parts, axis=1)  # sublane concat, tile-aligned
        return (x * cos + rot * sin).astype(jnp.float32)

    def lead_tree(x, op):  # (N, …) → (1, …): halving tree on the leading dim
        n = x.shape[0]
        while n > 1:
            if n % 2:  # fold the odd tail row into row 0
                x = jnp.concatenate(
                    [op(x[:1], x[n - 1 : n]), x[1 : n - 1]], axis=0
                )
                n -= 1
            half = n // 2
            x = op(x[:half], x[half:n])
            n = half
        return x

    def sub_tree(x):  # (F, N, S) → (F, 1, S): halving tree on the sublane dim
        n = x.shape[1]
        while n > 1:
            if n % 2:  # fold the odd tail sublane into sublane 0
                x = jnp.concatenate(
                    [x[:, :1] + x[:, n - 1 : n], x[:, 1 : n - 1]], axis=1
                )
                n -= 1
            half = n // 2
            x = x[:, :half] + x[:, half:n]
            n = half
        return x

    add = lambda a, b: a + b  # noqa: E731

    for h in range(hg):
        qs = rope_all(q_ref, h, qcs_ref)  # (F, d, S) fp32
        ks = rope_all(k_ref, h, kcs_ref)
        vs = v_ref[0, :, h * d : (h + 1) * d, :].astype(jnp.float32)
        for i in range(f):
            prod = ks * qs[i : i + 1]  # (F, d, S) — all key frames at once
            # d-reduction on the SUBLANE dim (jnp.sum crashes Mosaic; odd
            # widths handled by the fold)
            t = sub_tree(prod)
            base = (i * hg + h) * f
            bias3 = bias_ref[0, base : base + f, 0:1][:, :, None]  # (F,1,1)
            scores = t * scale + bias3  # (F, 1, S)
            # softmax over the LEADING frame dim
            m = lead_tree(scores, jnp.maximum)
            e = jnp.exp(scores - m)
            den = lead_tree(e, add)
            pv = vs * (e * (1.0 / den))  # (F, d, S): sublane broadcast
            out = lead_tree(pv, add)
            o_ref[0, i, h * d : (h + 1) * d, :] = out[0].astype(o_ref.dtype)


def pick_layout(c: int, frames: int, s: int, heads: int):
    """Choose (lane block, heads per group). Lane blocks must be ≥128; wide
    channel counts split the head axis over a third grid dim instead of
    shrinking the lane block. VMEM estimate: 8 bf16 tiles (double-buffered
    q/k/v + out pipeline) + bf16 rope-staged q/k + fp32 working set.

    The LAVIE_TF_HG / LAVIE_TF_BLK experiment knobs are read here — this
    function must only be called from UN-jitted code (gates and the
    `temporal_attention_cmajor` wrapper), which passes the result into the
    jitted `_temporal_cmajor` as static args; an env read inside the jitted
    trace would be frozen by the compile cache."""
    # Empirical Mosaic stack limits (measured on v5e): the fully-unrolled
    # f² body's stack scales with cg·blk; cg=128/blk=256 fits only when the
    # grid is 1 (no double buffering), cg=256/blk=128 blows the 16 MB scoped
    # VMEM. cg ≤ 128 with blk=128 compiles at every cascade shape — the
    # cg clamp below is a hard guard, env overrides included.
    d = c // heads
    import os

    env_hg = os.environ.get("LAVIE_TF_HG")
    hg0 = int(env_hg) if env_hg else 0
    if hg0 and (hg0 * d > 128 or heads % hg0 != 0):
        hg0 = 0  # reject overrides selecting a known-crashing cg
    if not hg0:
        hg0 = heads
        while hg0 > 1 and (hg0 * d > 128 or heads % hg0 != 0):
            hg0 //= 2
    env_blk = os.environ.get("LAVIE_TF_BLK")
    blks = (int(env_blk),) if env_blk else (128,)
    # walk hg DOWN when the VMEM estimate fails: long-frame shapes (TSR's
    # f=61) fit only with fewer heads per group, and there the kernel still
    # beats XLA's materialized-f²-scores path even at hg=1
    hg = hg0
    while hg >= 1:
        cg = hg * d
        if cg % 8 == 0 and cg <= 128:
            for blk in blks:
                if s % blk != 0:
                    continue
                est = (
                    8 * frames * cg * blk * 2  # pipelined q/k/v/out tiles
                    + 2 * frames * cg * blk * 2  # bf16 rope staging
                    # v5 stages whole-head q/k/v fp32 + the (F, d, S) score
                    # product — scales with d and FRAMES, the term that
                    # dominates at f=61
                    + 4 * frames * d * blk * 4
                    + 4 * cg * blk * 4  # fp32 softmax working set
                )
                if est <= 12 * 1024 * 1024:
                    return blk, hg
        if heads % max(hg // 2, 1) != 0:
            break
        hg //= 2
        if env_hg:
            break  # an explicit override is not silently shrunk
    return 0, 0


def temporal_fused_supported(frames: int, heads: int, head_dim: int, s: int) -> bool:
    """f small enough to unroll f², head_dim sublane-aligned, positions
    tileable to ≥128 lanes, tiles within VMEM — and ≥2 heads per group
    (d ≤ 64): at hg=1 the per-cell work is too thin and XLA wins (measured
    d=80: 4.8 vs 3.7 ms; d=128: 5.4 vs 3.7 — vs d=40: 7.3 vs 13.1 and
    d=64: 20.0 vs 23.3 where the kernel wins; cg=160 hg=2 at d=80 crashes
    the Mosaic compiler)."""
    if frames > 64 or head_dim % 8 != 0:
        return False
    c = heads * head_dim
    blk, hg = pick_layout(c, frames, s, heads)
    if blk <= 0:
        return False
    if frames <= 16:
        return hg >= 2
    # long-frame shapes (TSR f=61): XLA materializes the f² score tensor in
    # fp32 HBM (610 MB per L0 block at 61 frames) and pays boundary
    # transposes, so the kernel wins even at hg=1 — measured IN-MODEL on the
    # TSR CFG-2 forward: _apply_temporal 27.4 → 20.7 ms per L0 block (kernel
    # custom-call 17.1 vs 22.1 ms XLA attention math); standalone the kernel
    # is 21.2 vs 18.1 ms, i.e. the in-model win comes from the removed
    # (b f) s c ↔ (b s) f c transposes and channel-major projections
    return hg >= 1


def channel_permutation(heads: int, head_dim: int, hg: int) -> np.ndarray:
    """The kernel works in the STANDARD per-head channel basis (head-major,
    contiguous d per head) — no permutation. Kept for API symmetry."""
    return np.arange(heads * head_dim, dtype=np.int64)


def rope_tables_cmajor(
    frames: int,
    heads: int,
    head_dim: int,
    rope_dim: int,
    hg: int,
    cos: np.ndarray,  # (F, rope_dim//2) from embeddings.rope_half_frequencies
    sin: np.ndarray,
) -> np.ndarray:
    """(C, 2F) fp32 cos/sin tables in the permuted d-major/head-minor basis.
    Channels outside the rope dims get cos=1, sin=0 (identity). q and k share
    the table (the scale is applied on the fp32 score rows in-kernel)."""
    c = heads * head_dim
    r2 = rope_dim // 2
    cos_c = np.ones((c, frames), np.float32)
    sin_c = np.zeros((c, frames), np.float32)
    for h in range(heads):
        for dd in range(rope_dim):
            freq = dd if dd < r2 else dd - r2  # half-split: halves share freqs
            cos_c[h * head_dim + dd] = cos.T[freq]
            sin_c[h * head_dim + dd] = sin.T[freq]
    return np.concatenate([cos_c, sin_c], axis=1)  # (C, 2F)


@functools.partial(
    jax.jit,
    static_argnames=("frames", "heads", "head_dim", "rope_dim", "scale",
                     "blk", "hg", "version", "interpret"),
)
def _temporal_cmajor(q, k, v, bias_rows, cs, *, frames, heads, head_dim,
                     rope_dim, scale, blk, hg, version=2, interpret=False):
    c, b, f, s = q.shape
    cg = hg * head_dim
    groups = heads // hg
    grid = (b, s // blk, groups)
    n_g = bias_rows.shape[1]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel"),
    )
    if version == 5:
        # GEMM-native operand order: (B, F, C, S) row-major is the PHYSICAL
        # layout the projections' MXU output already has (M=C on sublanes,
        # N=S on lanes), so these transposes layout-assign to bitcasts and
        # the v2/v4 boundary retiling copies disappear.
        qt = jnp.transpose(q, (1, 2, 0, 3))
        kt = jnp.transpose(k, (1, 2, 0, 3))
        vt = jnp.transpose(v, (1, 2, 0, 3))
        # per-group (2F, Cg) tables, lane-padded to 128 (a lane block must be
        # 128-divisible or span the full dim; the pad lanes are never read)
        csg = jnp.transpose(cs.reshape(groups, cg, 2 * f), (0, 2, 1))
        if cg < 128:
            csg = jnp.pad(csg, ((0, 0), (0, 0), (0, 128 - cg)))
        spec5 = pl.BlockSpec((1, f, cg, blk), lambda b, i, g: (b, 0, g, i))
        out = pl.pallas_call(
            functools.partial(
                _kernel_v5, frames=frames, heads=hg, head_dim=head_dim,
                rope_dim=rope_dim, scale=scale,
            ),
            grid=grid,
            in_specs=[
                spec5,
                spec5,
                spec5,
                pl.BlockSpec((1, n_g, 128), lambda b, i, g: (g, 0, 0)),
                pl.BlockSpec((1, 2 * f, 128), lambda b, i, g: (g, 0, 0)),
                pl.BlockSpec((1, 2 * f, 128), lambda b, i, g: (g, 0, 0)),
            ],
            out_specs=spec5,
            out_shape=jax.ShapeDtypeStruct((b, f, c, s), q.dtype),
            compiler_params=params,
            interpret=interpret,
        )(qt, kt, vt, bias_rows, csg, csg)
        # back to the (C,B,F,S) contract — also a bitcast, and the
        # out-projection reads its K dim off sublanes GEMM-natively
        return jnp.transpose(out, (2, 0, 1, 3))
    qkv_spec = pl.BlockSpec((cg, 1, f, blk), lambda b, i, g: (g, b, 0, i))
    body = _kernel_v4 if version == 4 else _kernel
    return pl.pallas_call(
        functools.partial(
            body, frames=frames, heads=hg, head_dim=head_dim,
            rope_dim=rope_dim, scale=scale,
        ),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, n_g, 128), lambda b, i, g: (g, 0, 0)),
            pl.BlockSpec((cg, 2 * f), lambda b, i, g: (g, 0)),
            pl.BlockSpec((cg, 2 * f), lambda b, i, g: (g, 0)),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((c, b, f, s), q.dtype),
        compiler_params=params,
        interpret=interpret,
    )(q, k, v, bias_rows, cs, cs)


def temporal_attention_cmajor(
    q: jnp.ndarray,  # (C, B, F, S) channel-major, PERMUTED basis
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],  # (H, F, F) additive score bias (or None)
    cs: jnp.ndarray,  # (C, 2F) fp32 rope tables (permuted basis)
    *,
    heads: int,
    scale: float,
    rope_dim: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused frame-axis attention over channel-major tensors in the permuted
    d-major/head-minor basis (channel_permutation); returns (C, B, F, S)."""
    c, b, f, s = q.shape
    d = c // heads
    if bias is None:
        bias = jnp.zeros((heads, f, f), jnp.float32)
    import os

    blk, hg = pick_layout(c, f, s, heads)
    assert blk > 0 and hg > 0, (c, f, s, heads)
    # v5 (GEMM-native (B,F,C,S) blocks — no boundary retiling copies) is the
    # default at every supported shape; its trees handle odd f/d via folds.
    # v4 ((d,F,S)-shaped ops) needs power-of-2 frame AND head-dim counts;
    # LAVIE_TF_V5=0 pins v4 (pow2) / v2 for A/B, LAVIE_TF_V4=0 pins v2.
    pow2 = (f & (f - 1)) == 0 and (d & (d - 1)) == 0
    if os.environ.get("LAVIE_TF_V5", "1") == "1":
        version = 5
    elif pow2 and os.environ.get("LAVIE_TF_V4", "1") == "1":
        version = 4
    else:
        version = 2
    groups = heads // hg
    # (H, F, F) → (G, (i·Hg + h_local)·F + j, lanes) — per (i, h) the f
    # j-rows are contiguous so the kernel slices one (f, S) bias block
    bias_rows = bias.astype(jnp.float32).reshape(groups, hg, f, f)
    bias_rows = jnp.transpose(bias_rows, (0, 2, 1, 3)).reshape(groups, f * hg * f, 1)
    bias_rows = jnp.broadcast_to(bias_rows, (groups, f * hg * f, 128))
    return _temporal_cmajor(
        q, k, v, bias_rows, cs,
        frames=f, heads=heads, head_dim=d, rope_dim=rope_dim, scale=scale,
        blk=blk, hg=hg, version=version, interpret=interpret,
    )
