"""Activation parity vs the REFERENCE torch modules themselves.

These tests import the reference's own model files from /root/reference
(via tests/ref_shim.py — torch + einops are installed; the few diffusers-era
symbols they need are shimmed), convert their randomly-initialized weights
into our flax modules with io.convert, and assert fp32 activation parity.

This is the evidence chain VERDICT r1 named as the top gap: the spatio-
temporal UNet blocks are 95% of the FLOPs, and before this suite only
CLIP-text and MappingNetwork had cross-framework tests.

Layout conventions: torch is (B, C, F, H, W) NCFHW; ours is channels-last
(B, F, H, W, C). Attention rows are (B, S, C) in both.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")
import ref_shim

from lavie_tpu.io.convert import convert_state_dict, permute_rope_channels

ATOL = 1e-4


def t2j_video(x_t: "torch.Tensor") -> jnp.ndarray:
    """(B, C, F, H, W) torch → (B, F, H, W, C) jax."""
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 4, 1))


def j2t_video(y_j: jnp.ndarray) -> np.ndarray:
    """(B, F, H, W, C) jax → (B, C, F, H, W) numpy."""
    return np.asarray(y_j).transpose(0, 4, 1, 2, 3)


def sd_numpy(mod: "torch.nn.Module") -> dict:
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def randomize_zero_weights(mod: "torch.nn.Module", seed: int = 7) -> None:
    """Re-randomize zero-initialized projections (the reference zero-inits
    temporal-attn out projections and temporal-module shift convs, which
    would otherwise make those paths no-ops and the parity test vacuous)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            if p.numel() and bool((p == 0).all()):
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def rand_t(g, *shape):
    return torch.randn(*shape, generator=g)


# ---------------------------------------------------------------------------
# base/models/resnet.py primitives
# ---------------------------------------------------------------------------


class TestResnetPrimitives:
    def test_inflated_conv3d(self):
        """reference: base/models/resnet.py:13-21 — per-frame 2D conv."""
        ref = ref_shim.load_ref("base", "resnet")
        g = torch.Generator().manual_seed(0)
        conv_t = ref.InflatedConv3d(6, 10, kernel_size=3, padding=1)
        with torch.no_grad():
            conv_t.weight.copy_(rand_t(g, *conv_t.weight.shape) * 0.2)
            conv_t.bias.copy_(rand_t(g, *conv_t.bias.shape) * 0.2)

        from lavie_tpu.nn.layers import InflatedConv

        ours = InflatedConv(features=10, kernel_size=(3, 3))
        x_t = rand_t(g, 2, 6, 3, 8, 8)
        x_j = t2j_video(x_t)
        init = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        # standalone module: the torch Conv2d's bare weight/bias keys live
        # under our wrapper's 'conv' submodule name
        sd = {f"conv.{k}": v for k, v in sd_numpy(conv_t).items()}
        params = convert_state_dict(init, sd)

        with torch.no_grad():
            want = conv_t(x_t).numpy()
        got = j2t_video(ours.apply({"params": params}, x_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_resnet_block3d(self):
        """reference: base/models/resnet.py:113-207 — GN→SiLU→conv→+temb→
        GN→SiLU→conv + shortcut."""
        ref = ref_shim.load_ref("base", "resnet")
        torch.manual_seed(1)
        blk_t = ref.ResnetBlock3D(
            in_channels=16, out_channels=24, temb_channels=32, groups=8,
            dropout=0.0,
        ).eval()

        from lavie_tpu.nn.resnet import ResnetBlock3D

        ours = ResnetBlock3D(in_channels=16, out_channels=24, temb_channels=32, groups=8)
        g = torch.Generator().manual_seed(2)
        x_t = rand_t(g, 2, 16, 3, 8, 8)
        temb_t = rand_t(g, 2, 32)
        x_j, temb_j = t2j_video(x_t), jnp.asarray(temb_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j, temb_j)["params"]
        params = convert_state_dict(init, sd_numpy(blk_t))

        with torch.no_grad():
            want = blk_t(x_t, temb_t).numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, temb_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_upsample3d(self):
        """reference: base/models/resnet.py:24-76 — nearest ×2 spatial-only
        then per-frame conv."""
        ref = ref_shim.load_ref("base", "resnet")
        torch.manual_seed(3)
        up_t = ref.Upsample3D(12, use_conv=True).eval()

        from lavie_tpu.nn.resnet import Upsample3D

        ours = Upsample3D(channels=12)
        g = torch.Generator().manual_seed(4)
        x_t = rand_t(g, 1, 12, 2, 6, 6)
        x_j = t2j_video(x_t)
        init = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        params = convert_state_dict(init, sd_numpy(up_t))
        with torch.no_grad():
            want = up_t(x_t).numpy()
        got = j2t_video(ours.apply({"params": params}, x_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_downsample3d(self):
        """reference: base/models/resnet.py:79-110 — stride-2 per-frame conv."""
        ref = ref_shim.load_ref("base", "resnet")
        torch.manual_seed(5)
        down_t = ref.Downsample3D(12, use_conv=True, padding=1).eval()

        from lavie_tpu.nn.resnet import Downsample3D

        ours = Downsample3D(channels=12)
        g = torch.Generator().manual_seed(6)
        x_t = rand_t(g, 1, 12, 2, 8, 8)
        x_j = t2j_video(x_t)
        init = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        params = convert_state_dict(init, sd_numpy(down_t))
        with torch.no_grad():
            want = down_t(x_t).numpy()
        got = j2t_video(ours.apply({"params": params}, x_j))
        np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# base/models/attention.py
# ---------------------------------------------------------------------------


class TestAttentionParity:
    def _cross_attention_pair(self, cross_dim=None):
        ref = ref_shim.load_ref("base", "attention")
        torch.manual_seed(10)
        attn_t = ref.CrossAttention(
            query_dim=32, cross_attention_dim=cross_dim, heads=4, dim_head=8,
        ).eval()

        from lavie_tpu.nn.attention import Attention

        ours = Attention(query_dim=32, heads=4, head_dim=8,
                         cross_attention_dim=cross_dim)
        return attn_t, ours

    def test_self_attention(self):
        """reference: base/models/attention.py:43-239 (attn1 path)."""
        attn_t, ours = self._cross_attention_pair()
        g = torch.Generator().manual_seed(11)
        x_t = rand_t(g, 2, 24, 32)
        x_j = jnp.asarray(x_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        params = convert_state_dict(init, sd_numpy(attn_t))
        with torch.no_grad():
            want = attn_t(x_t).numpy()
        got = np.asarray(ours.apply({"params": params}, x_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_text_cross_attention(self):
        """reference: base/models/attention.py (attn2, kv = text states)."""
        attn_t, ours = self._cross_attention_pair(cross_dim=20)
        g = torch.Generator().manual_seed(12)
        x_t = rand_t(g, 2, 24, 32)
        ctx_t = rand_t(g, 2, 7, 20)
        x_j, ctx_j = jnp.asarray(x_t.numpy()), jnp.asarray(ctx_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j, ctx_j)["params"]
        params = convert_state_dict(init, sd_numpy(attn_t))
        with torch.no_grad():
            want = attn_t(x_t, encoder_hidden_states=ctx_t).numpy()
        got = np.asarray(ours.apply({"params": params}, x_j, ctx_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_temporal_attention_head_dim40_partial_rope(self):
        """The PRODUCTION head geometry: head_dim 40 with the shared
        RotaryEmbedding(32) rotating only 32 of the 40 dims — the remaining 8
        pass through unrotated (reference: base/models/unet.py:185 builds
        RotaryEmbedding(32) for every temporal attention;
        base/models/attention.py:644-646 applies it to q/k). Verifies the
        converter's partial re-basis leaves the 8 pass-through columns alone."""
        ref = ref_shim.load_ref("base", "attention")
        rot = sys.modules["rotary_embedding_torch"]
        torch.manual_seed(33)
        attn_t = ref.TemporalAttention(
            query_dim=320, heads=8, dim_head=40,
            rotary_emb=rot.RotaryEmbedding(32),
        ).eval()
        randomize_zero_weights(attn_t, seed=34)

        from lavie_tpu.nn.attention import TemporalAttention

        ours = TemporalAttention(
            query_dim=320, heads=8, head_dim=40, variant="rope_relbias",
            rope_dim=32, num_buckets=32, max_distance=32,
        )
        g = torch.Generator().manual_seed(35)
        x_t = rand_t(g, 3, 16, 320)  # 16 real frames, (b·h·w, f, c) rows
        x_j = jnp.asarray(x_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        params = convert_state_dict(init, sd_numpy(attn_t))
        params = permute_rope_channels(
            {"attn_temp": params}, heads=8, rot_dim=32
        )["attn_temp"]
        with torch.no_grad():
            want = attn_t(x_t).numpy()
        got = np.asarray(ours.apply({"params": params}, x_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    @pytest.mark.parametrize("frames", [5, 16])
    def test_temporal_attention_rope_relbias(self, frames):
        """reference: base/models/attention.py:562-667 — interleaved RoPE on
        q/k + bucketed relative-position bias. Exercises the converter's
        permute_rope_channels re-basis (interleaved → half-split)."""
        ref = ref_shim.load_ref("base", "attention")
        rot = sys.modules["rotary_embedding_torch"]
        torch.manual_seed(13)
        head_dim = 8
        attn_t = ref.TemporalAttention(
            query_dim=32, heads=4, dim_head=head_dim,
            rotary_emb=rot.RotaryEmbedding(min(32, head_dim)),
        ).eval()

        from lavie_tpu.nn.attention import TemporalAttention

        ours = TemporalAttention(
            query_dim=32, heads=4, head_dim=head_dim, variant="rope_relbias",
            rope_dim=min(32, head_dim), num_buckets=32, max_distance=32,
        )
        g = torch.Generator().manual_seed(14)
        x_t = rand_t(g, 3, frames, 32)
        x_j = jnp.asarray(x_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        params = convert_state_dict(init, sd_numpy(attn_t))
        # re-basis: wrap in the converter's marker structure so the walk
        # applies to to_q/to_k (it keys on an enclosing "attn_temp" module)
        params = permute_rope_channels(
            {"attn_temp": params}, heads=4, rot_dim=min(32, head_dim)
        )["attn_temp"]
        with torch.no_grad():
            want = attn_t(x_t).numpy()
        got = np.asarray(ours.apply({"params": params}, x_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_sparse_causal_attention(self):
        """reference: interpolation/models/attention.py:609-665 — kv tokens =
        concat(frame 0, frame i-1)."""
        ref = ref_shim.load_ref("interpolation", "attention")
        torch.manual_seed(15)
        attn_t = ref.SparseCausalAttention(
            query_dim=32, heads=4, dim_head=8,
        ).eval()

        from lavie_tpu.nn.attention import SparseCausalAttention

        ours = SparseCausalAttention(query_dim=32, heads=4, head_dim=8)
        g = torch.Generator().manual_seed(16)
        frames, s = 5, 12
        x_t = rand_t(g, 2 * frames, s, 32)  # (b·f, d, c)
        x_j = jnp.asarray(x_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j, frames)["params"]
        params = convert_state_dict(init, sd_numpy(attn_t))
        with torch.no_grad():
            want = attn_t(x_t, video_length=frames).numpy()
        got = np.asarray(ours.apply({"params": params}, x_j, frames))
        np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# vsr/models/resnet.py + temporal_module.py
# ---------------------------------------------------------------------------


class TestVSRModuleParity:
    def test_resnet_block3dcnn(self):
        """reference: vsr/models/resnet.py:220-316 — the repo's only true 3D
        convs, kernel (5,1,1)/(3,1,1) over frames."""
        ref = ref_shim.load_ref("vsr", "resnet")
        torch.manual_seed(20)
        blk_t = ref.ResnetBlock3DCNN(
            in_channels=16, out_channels=16, kernel=(5, 1, 1),
            temb_channels=None, groups=8,
        ).eval()

        from lavie_tpu.nn.resnet import ResnetBlock3DCNN

        ours = ResnetBlock3DCNN(in_channels=16, out_channels=16,
                                kernel_frames=5, temb_channels=None, groups=8)
        g = torch.Generator().manual_seed(21)
        x_t = rand_t(g, 1, 16, 6, 8, 8)
        x_j = t2j_video(x_t)
        init = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        params = convert_state_dict(init, sd_numpy(blk_t))
        with torch.no_grad():
            want = blk_t(x_t, None).numpy()
        got = j2t_video(ours.apply({"params": params}, x_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_temporal_module3d_cnn_path(self):
        """reference: vsr/models/temporal_module.py:65-178 — the shipped CNN
        path: ResnetBlock3DCNN → spatial ResnetBlock3D → zero-init 1×1 shift
        conv, residual-added to the input (attention_block_types=("",""),
        reference: vsr/configs/unet_3d_config.json:52-55)."""
        ref = ref_shim.load_ref("vsr", "temporal_module")
        torch.manual_seed(22)
        # the reference hard-codes groups=32 in its resnets
        # (temporal_module.py:110-114), so channels must be ≥32
        tm_t = ref.TemporalModule3D(
            in_channels=32,
            out_channels=32,
            temb_channels=24,
            attention_block_types=("", ""),
            video_condition=False,
        ).eval()
        randomize_zero_weights(tm_t)

        from lavie_tpu.nn.temporal_module import TemporalModule3D

        ours = TemporalModule3D(channels=32, temb_channels=24, norm_num_groups=32)
        g = torch.Generator().manual_seed(23)
        x_t = rand_t(g, 1, 32, 4, 8, 8)
        temb_t = rand_t(g, 1, 24)
        x_j, temb_j = t2j_video(x_t), jnp.asarray(temb_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j, temb_j)["params"]
        params = convert_state_dict(init, sd_numpy(tm_t))
        with torch.no_grad():
            want = tm_t(x_t, temb=temb_t).numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, temb_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    @pytest.mark.parametrize(
        "block_types",
        [("Spatial", "Temporal"), ("SpatialTemporalShift", "CrossFrame")],
        ids=["spatial-temporal", "tsm-crossframe"],
    )
    def test_temporal_module3d_versatile_attention(self, block_types):
        """reference: vsr/models/temporal_module.py:116-143 — the optional
        attention branch: TemporalTransformer3DModel (GroupNorm(8) → proj_in →
        TemporalTransformerBlock ×1 → proj_out → +residual) between the
        spatial resnet and the shift conv. Covers all four
        VersatileSelfAttention modes and the AdaLayerNorm timestep
        conditioning across the two parametrizations."""
        ref = ref_shim.load_ref("vsr", "temporal_module")
        torch.manual_seed(24)
        tm_t = ref.TemporalModule3D(
            in_channels=32,
            out_channels=32,
            temb_channels=24,
            num_attention_layers=1,
            num_attention_head=8,
            attention_dim_div=2,
            attention_block_types=block_types,
            cross_frame_attention_mode="0_i-1_i",
            temporal_shift_fold_div=2,
            temporal_shift_direction="right",
            use_dcn_warpping=False,
            use_deformable_conv=False,
            video_condition=False,
        ).eval()
        randomize_zero_weights(tm_t)

        from lavie_tpu.nn.temporal_module import TemporalModule3D

        ours = TemporalModule3D(
            channels=32,
            temb_channels=24,
            norm_num_groups=32,
            attention_block_types=block_types,
            cross_frame_attention_mode="0_i-1_i",
            num_attention_heads=8,
            attention_dim_div=2,
        )
        g = torch.Generator().manual_seed(25)
        x_t = rand_t(g, 2, 32, 4, 8, 8)
        temb_t = rand_t(g, 2, 24)
        ts_t = torch.tensor([37, 503])
        x_j, temb_j = t2j_video(x_t), jnp.asarray(temb_t.numpy())
        ts_j = jnp.asarray(ts_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j, temb_j, ts_j)["params"]
        # Real checkpoints carry these modules under *_temporal_block(s)
        # prefixes (vsr/models/unet.py:194-196) — which is what gates the
        # converter's attn_temporal→attn_temp remap OFF for this subtree
        # (the versatile block keeps the reference name verbatim). Convert
        # under the same context the checkpoint provides.
        sd = {f"mid_temporal_block.{k}": v for k, v in sd_numpy(tm_t).items()}
        params = convert_state_dict(init, sd, prefix="mid_temporal_block.")
        with torch.no_grad():
            want = tm_t(x_t, temb=temb_t, timesteps=ts_t).numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, temb_j, ts_j))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_temporal_module3d_video_condition_scale_shift(self):
        """reference: vsr/models/temporal_module.py:106-112,:155-176 — the
        conditioning-video concat branch (v_cond_conv: ResnetBlock3D 3→C/4,
        groups=3/groups_out=32) and the scale-shift residual variant
        ((1+scale)·input + shift from a zero-init 1×1 conv)."""
        ref = ref_shim.load_ref("vsr", "temporal_module")
        torch.manual_seed(30)
        tm_t = ref.TemporalModule3D(
            in_channels=128,
            out_channels=128,
            temb_channels=24,
            attention_block_types=("", ""),
            use_scale_shift=True,
            video_condition=True,
        ).eval()
        randomize_zero_weights(tm_t)

        from lavie_tpu.nn.temporal_module import TemporalModule3D

        ours = TemporalModule3D(
            channels=128, temb_channels=24, norm_num_groups=32,
            video_condition=True, use_scale_shift=True,
        )
        g = torch.Generator().manual_seed(31)
        x_t = rand_t(g, 2, 128, 4, 4, 4)
        cond_t = rand_t(g, 2, 3, 4, 4, 4)
        temb_t = rand_t(g, 2, 24)
        x_j, cond_j = t2j_video(x_t), t2j_video(cond_t)
        temb_j = jnp.asarray(temb_t.numpy())
        init = ours.init(
            jax.random.PRNGKey(0), x_j, temb_j, condition_video=cond_j
        )["params"]
        sd = {f"mid_temporal_block.{k}": v for k, v in sd_numpy(tm_t).items()}
        params = convert_state_dict(init, sd, prefix="mid_temporal_block.")
        with torch.no_grad():
            want = tm_t(x_t, condition_video=cond_t, temb=temb_t).numpy()
        got = j2t_video(
            ours.apply({"params": params}, x_j, temb_j, condition_video=cond_j)
        )
        np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# Transformer3DModel (the factorized spatial/cross/temporal block)
# ---------------------------------------------------------------------------


class TestTransformer3DParity:
    def test_base_transformer3d(self):
        """reference: base/models/attention.py:294-560 — frame folding into
        batch, per-frame text repeat, spatial self-attn → text cross-attn →
        temporal attn (RoPE+rel-bias) → GEGLU FF."""
        ref = ref_shim.load_ref("base", "attention")
        rot = sys.modules["rotary_embedding_torch"]
        torch.manual_seed(30)
        # head_dim must be ≥32: the reference hard-codes RotaryEmbedding(32)
        # (base/models/unet.py:185) which cannot rotate narrower heads
        heads, ch = 2, 64
        tr_t = ref.Transformer3DModel(
            num_attention_heads=heads,
            attention_head_dim=ch // heads,
            in_channels=ch,
            num_layers=1,
            norm_num_groups=8,
            cross_attention_dim=24,
            rotary_emb=rot.RotaryEmbedding(32),
        ).eval()
        randomize_zero_weights(tr_t)

        from lavie_tpu.nn.transformer import Transformer3D

        ours = Transformer3D(
            in_channels=ch, heads=heads, head_dim=ch // heads,
            cross_attention_dim=24, norm_num_groups=8,
            temporal_attention="rope_relbias", rope_dim=min(32, ch // heads),
        )
        g = torch.Generator().manual_seed(31)
        b, f, h, w = 1, 3, 4, 4
        x_t = rand_t(g, b, ch, f, h, w)
        ctx_t = rand_t(g, b, 7, 24)
        x_j = t2j_video(x_t)
        ctx_j = jnp.asarray(ctx_t.numpy())
        init = ours.init(jax.random.PRNGKey(0), x_j, ctx_j)["params"]
        params = convert_state_dict(init, sd_numpy(tr_t))
        params = permute_rope_channels(params, heads=heads,
                                       rot_dim=min(32, ch // heads))
        with torch.no_grad():
            want = tr_t(x_t, encoder_hidden_states=ctx_t,
                        use_image_num=0).sample.numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, ctx_j))
        np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# Full tiny-UNet forwards — the end-to-end conversion + semantics check
# ---------------------------------------------------------------------------


def _our_unet_and_params(cfg, ref_unet, rng, *example_args, rope_heads=None):
    from lavie_tpu.nn.unet import UNet3D

    ours = UNet3D(config=cfg)
    init = ours.init(rng, *example_args)["params"]
    # strict_unused: every reference parameter must land somewhere — this is
    # what caught the VSR attn_temporal naming and resblock_temporal blocks
    params = convert_state_dict(init, sd_numpy(ref_unet), strict_unused=True)
    if rope_heads:
        params = permute_rope_channels(params, heads=rope_heads, rot_dim=32)
    return ours, params


@pytest.mark.slow
class TestTinyUNetForwardParity:
    def test_base_unet(self):
        """reference: base/models/unet.py:98-512 (full forward: time embed →
        conv_in → down ×4 → mid → up ×4 → GN/SiLU/conv_out)."""
        ref = ref_shim.load_ref("base", "unet")
        torch.manual_seed(40)
        unet_t = ref.UNet3DConditionModel(
            in_channels=4, out_channels=4,
            block_out_channels=(64, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8, cross_attention_dim=24, attention_head_dim=2,
        ).eval()
        randomize_zero_weights(unet_t)

        from lavie_tpu.core.config import UNetConfig

        cfg = UNetConfig(
            block_out_channels=(64, 64, 64, 64), layers_per_block=1,
            num_attention_heads=2, norm_num_groups=8, cross_attention_dim=24,
            rope_dim=32,
        )
        g = torch.Generator().manual_seed(41)
        b, f, hh, ww = 1, 3, 16, 16
        x_t = rand_t(g, b, 4, f, hh, ww)
        ctx_t = rand_t(g, b, 7, 24)
        t_t = torch.tensor([3], dtype=torch.long)
        x_j = t2j_video(x_t)
        ctx_j = jnp.asarray(ctx_t.numpy())
        t_j = jnp.asarray([3])
        ours, params = _our_unet_and_params(
            cfg, unet_t, jax.random.PRNGKey(0), x_j, t_j, ctx_j, rope_heads=2
        )
        with torch.no_grad():
            want = unet_t(x_t, t_t, encoder_hidden_states=ctx_t).sample.numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, t_j, ctx_j))
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_interpolation_unet(self):
        """reference: interpolation/models/unet.py — 8-ch input,
        SparseCausalAttention attn1, plain temporal attention."""
        ref = ref_shim.load_ref("interpolation", "unet")
        torch.manual_seed(42)
        unet_t = ref.UNet3DConditionModel(
            in_channels=8, out_channels=4,
            block_out_channels=(64, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8, cross_attention_dim=24, attention_head_dim=2,
            use_first_frame=True,
        ).eval()
        randomize_zero_weights(unet_t)

        from lavie_tpu.core.config import UNetConfig

        cfg = UNetConfig(
            in_channels=8, block_out_channels=(64, 64, 64, 64),
            layers_per_block=1, num_attention_heads=2, norm_num_groups=8,
            cross_attention_dim=24, spatial_attention="sparse_causal",
            temporal_attention="plain", ff_before_temporal=True,
        )
        g = torch.Generator().manual_seed(43)
        b, f, hh, ww = 1, 3, 16, 16
        x_t = rand_t(g, b, 8, f, hh, ww)
        ctx_t = rand_t(g, b, 7, 24)
        t_t = torch.tensor([5], dtype=torch.long)
        x_j = t2j_video(x_t)
        ctx_j = jnp.asarray(ctx_t.numpy())
        t_j = jnp.asarray([5])
        ours, params = _our_unet_and_params(
            cfg, unet_t, jax.random.PRNGKey(0), x_j, t_j, ctx_j
        )
        with torch.no_grad():
            want = unet_t(x_t, t_t, encoder_hidden_states=ctx_t).sample.numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, t_j, ctx_j))
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_vsr_unet(self):
        """reference: vsr/models/unet.py:102-590 — 7-ch low-res concat,
        noise-level class embedding, TemporalModule3D after every block."""
        ref = ref_shim.load_ref("vsr", "unet")
        torch.manual_seed(44)
        unet_t = ref.UNet3DVSRModel(
            down_temporal_idx=(0, 1, 2, 3), mid_temporal=True,
            up_temporal_idx=(0, 1, 2, 3), video_condition=False,
            temporal_module_config=dict(
                num_attention_layers=1, attention_block_types=("", ""),
                cross_frame_attention_mode="0_i-1_i",
                temporal_shift_fold_div=2, temporal_shift_direction="right",
                use_dcn_warpping=False, use_deformable_conv=False,
                attention_dim_div=2,
            ),
            in_channels=7, out_channels=4,
            block_out_channels=(32, 32, 32, 64), layers_per_block=1,
            norm_num_groups=32, cross_attention_dim=24, attention_head_dim=1,
            num_class_embeds=10,
        ).eval()
        randomize_zero_weights(unet_t)

        from lavie_tpu.core.config import UNetConfig

        cfg = UNetConfig(
            in_channels=7, block_out_channels=(32, 32, 32, 64),
            down_block_types=(
                "DownBlock3D", "CrossAttnDownBlock3D",
                "CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
            ),
            up_block_types=(
                "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
                "CrossAttnUpBlock3D", "UpBlock3D",
            ),
            layers_per_block=1, num_attention_heads=1, norm_num_groups=32,
            cross_attention_dim=24,
            only_cross_attention=(True, True, True, False),
            use_linear_projection=True, class_embed_type="num_embeds",
            num_class_embeds=10, use_temporal_modules=True,
            transformer_temporal_resblock=True, rope_dim=32,
        )
        g = torch.Generator().manual_seed(45)
        b, f, hh, ww = 1, 2, 16, 16
        lat_t = rand_t(g, b, 4, f, hh, ww)
        lr_t = rand_t(g, b, 3, f, hh, ww)
        ctx_t = rand_t(g, b, 7, 24)
        t_t = torch.tensor([3], dtype=torch.long)
        cl_t = torch.tensor([5], dtype=torch.long)
        x_j = jnp.concatenate([t2j_video(lat_t), t2j_video(lr_t)], axis=-1)
        ctx_j = jnp.asarray(ctx_t.numpy())
        t_j = jnp.asarray([3])
        cl_j = jnp.asarray([5])
        from lavie_tpu.nn.unet import UNet3D

        ours = UNet3D(config=cfg)
        init = ours.init(jax.random.PRNGKey(0), x_j, t_j, ctx_j, cl_j)["params"]
        params = convert_state_dict(init, sd_numpy(unet_t), strict_unused=True)
        params = permute_rope_channels(params, heads=1, rot_dim=32)
        with torch.no_grad():
            want = unet_t(
                lat_t, t_t, low_res=lr_t, encoder_hidden_states=ctx_t,
                class_labels=cl_t,
            ).sample.numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, t_j, ctx_j, cl_j))
        np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow
class TestFullWidthUNetForwardParity:
    """Forward parity at the PRODUCTION widths — the configs the real
    checkpoints ship (320/640/1280 channels, 8 heads, head_dim 40/80/160,
    partial RoPE; VSR 256/512/512/1024). Spatial dims stay tiny (16×16
    latents, 2-3 frames) — parameters and per-channel math are exactly
    checkpoint-shaped (909M params for base), so this also exercises
    full-size strict_unused conversion (reference surgery being replaced:
    base/models/unet.py:540-588)."""

    def test_base_unet_full_width(self):
        """reference: base/models/unet.py:98-512 at its real defaults
        (blocks 320/640/1280/1280, layers_per_block 2, heads 8 →
        head_dim 40/80/160 with RotaryEmbedding(32) partial rotation,
        cross_attention_dim 768)."""
        ref = ref_shim.load_ref("base", "unet")
        torch.manual_seed(50)
        unet_t = ref.UNet3DConditionModel(cross_attention_dim=768).eval()
        randomize_zero_weights(unet_t, seed=51)

        from lavie_tpu.core.config import UNetConfig

        cfg = UNetConfig.base_t2v()
        g = torch.Generator().manual_seed(52)
        b, f, hh, ww = 1, 2, 16, 16
        x_t = rand_t(g, b, 4, f, hh, ww)
        ctx_t = rand_t(g, b, 7, 768)
        t_t = torch.tensor([321], dtype=torch.long)
        x_j = t2j_video(x_t)
        ctx_j = jnp.asarray(ctx_t.numpy())
        t_j = jnp.asarray([321])
        ours, params = _our_unet_and_params(
            cfg, unet_t, jax.random.PRNGKey(0), x_j, t_j, ctx_j, rope_heads=8
        )
        n_params = sum(x.size for x in jax.tree.leaves(params))
        assert n_params > 9e8  # checkpoint-shaped: ~909M converted params
        with torch.no_grad():
            want = unet_t(x_t, t_t, encoder_hidden_states=ctx_t).sample.numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, t_j, ctx_j))
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_interpolation_unet_full_width(self):
        """reference: interpolation/models/unet.py at the TSR production
        config — in_channels 8 (copy_no_mask conv_in widening at full width,
        :503-530), use_first_frame SparseCausal attn1, plain temporal."""
        ref = ref_shim.load_ref("interpolation", "unet")
        torch.manual_seed(53)
        unet_t = ref.UNet3DConditionModel(
            in_channels=8, cross_attention_dim=768, use_first_frame=True,
        ).eval()
        randomize_zero_weights(unet_t, seed=54)

        from lavie_tpu.core.config import UNetConfig

        cfg = UNetConfig.interpolation()
        g = torch.Generator().manual_seed(55)
        b, f, hh, ww = 1, 3, 16, 16
        x_t = rand_t(g, b, 8, f, hh, ww)
        ctx_t = rand_t(g, b, 7, 768)
        t_t = torch.tensor([777], dtype=torch.long)
        x_j = t2j_video(x_t)
        ctx_j = jnp.asarray(ctx_t.numpy())
        t_j = jnp.asarray([777])
        ours, params = _our_unet_and_params(
            cfg, unet_t, jax.random.PRNGKey(0), x_j, t_j, ctx_j
        )
        with torch.no_grad():
            want = unet_t(x_t, t_t, encoder_hidden_states=ctx_t).sample.numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, t_j, ctx_j))
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_vsr_unet_full_width(self):
        """reference: vsr/models/unet.py:102-590 at the SHIPPED
        unet_3d_config.json (blocks 256/512/512/1024, heads 8, cross 1024,
        only_cross [T,T,T,F], linear projections, 1000 noise-level class
        embeds, TemporalModule3D after every block)."""
        ref = ref_shim.load_ref("vsr", "unet")
        torch.manual_seed(56)
        unet_t = ref.UNet3DVSRModel(
            down_temporal_idx=(0, 1, 2, 3), mid_temporal=True,
            up_temporal_idx=(0, 1, 2, 3), video_condition=False,
            temporal_module_config=dict(
                num_attention_layers=1, attention_block_types=("", ""),
                cross_frame_attention_mode="0_i-1_i",
                temporal_shift_fold_div=2, temporal_shift_direction="right",
                use_dcn_warpping=False, use_deformable_conv=False,
                attention_dim_div=2,
            ),
            in_channels=7, out_channels=4,
            block_out_channels=(256, 512, 512, 1024), layers_per_block=2,
            norm_num_groups=32, cross_attention_dim=1024,
            attention_head_dim=8, num_class_embeds=1000,
            down_block_types=(
                "DownBlock3D", "CrossAttnDownBlock3D",
                "CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
            ),
            up_block_types=(
                "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
                "CrossAttnUpBlock3D", "UpBlock3D",
            ),
            only_cross_attention=(True, True, True, False),
            use_linear_projection=True,
        ).eval()
        randomize_zero_weights(unet_t, seed=57)

        from lavie_tpu.core.config import UNetConfig
        from lavie_tpu.nn.unet import UNet3D

        cfg = UNetConfig.vsr()
        g = torch.Generator().manual_seed(58)
        b, f, hh, ww = 1, 2, 16, 16
        lat_t = rand_t(g, b, 4, f, hh, ww)
        lr_t = rand_t(g, b, 3, f, hh, ww)
        ctx_t = rand_t(g, b, 7, 1024)
        t_t = torch.tensor([123], dtype=torch.long)
        cl_t = torch.tensor([50], dtype=torch.long)
        x_j = jnp.concatenate([t2j_video(lat_t), t2j_video(lr_t)], axis=-1)
        ctx_j = jnp.asarray(ctx_t.numpy())
        t_j = jnp.asarray([123])
        cl_j = jnp.asarray([50])
        ours = UNet3D(config=cfg)
        init = ours.init(jax.random.PRNGKey(0), x_j, t_j, ctx_j, cl_j)["params"]
        params = convert_state_dict(init, sd_numpy(unet_t), strict_unused=True)
        params = permute_rope_channels(params, heads=8, rot_dim=32)
        with torch.no_grad():
            want = unet_t(
                lat_t, t_t, low_res=lr_t, encoder_hidden_states=ctx_t,
                class_labels=cl_t,
            ).sample.numpy()
        got = j2t_video(ours.apply({"params": params}, x_j, t_j, ctx_j, cl_j))
        np.testing.assert_allclose(got, want, atol=2e-3)


class TestNoiseAugParity:
    def test_q_sample_matches_reference(self):
        """reference: vsr/models/upscaling.py:58-95 — q_sample under the
        squared-sqrt-linspace β schedule, same x/noise/levels both sides."""
        ref = ref_shim.load_ref("vsr", "upscaling")
        aug_t = ref.ImageConcatWithNoiseAugmentation(
            noise_schedule_config={"timesteps": 1000}, max_noise_level=350
        )
        from lavie_tpu.diffusion.noise_aug import low_scale_schedule
        from lavie_tpu.diffusion.samplers import add_noise

        sched = low_scale_schedule(1000)
        g = torch.Generator().manual_seed(40)
        x_t = rand_t(g, 3, 4, 8, 8)
        noise_t = rand_t(g, 3, 4, 8, 8)
        lvl_t = torch.tensor([0, 177, 349])
        with torch.no_grad():
            want = aug_t.q_sample(x_t, lvl_t, noise=noise_t).numpy()
        got = add_noise(
            sched,
            jnp.asarray(x_t.numpy()),
            jnp.asarray(noise_t.numpy()),
            jnp.asarray(lvl_t.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestOpenAIDiffusionParity:
    """Direct parity vs the reference's OpenAI SpacedDiffusion files
    (interpolation/diffusion/ — torch+numpy, importable verbatim).
    The TSR stage samples with create_diffusion(str(50)): linear β,
    EPSILON mean, FIXED_LARGE variance, eta=0 DDIM, clip_denoised=False
    (reference: interpolation/sample.py:118-123, diffusion/__init__.py)."""

    @staticmethod
    def _load():
        import importlib
        import types

        pkg = "ref_interp_diffusion"
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = ["/root/reference/interpolation/diffusion"]
            sys.modules[pkg] = mod
        gd = importlib.import_module(f"{pkg}.gaussian_diffusion")
        respace = importlib.import_module(f"{pkg}.respace")
        return gd, respace

    def _spaced(self, gd, respace, steps=50):
        return respace.SpacedDiffusion(
            use_timesteps=respace.space_timesteps(1000, str(steps)),
            betas=gd.get_named_beta_schedule("linear", 1000),
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.FIXED_LARGE,
            loss_type=gd.LossType.MSE,
        )

    def test_spaced_timestep_sets_match(self):
        gd, respace = self._load()
        from lavie_tpu.diffusion.samplers import spaced_timesteps

        for steps in (50, 25, 10):
            want = sorted(respace.space_timesteps(1000, str(steps)))
            ts_desc, prev_desc = spaced_timesteps(steps, 1000)
            got = sorted(int(t) for t in ts_desc)
            assert got == want, (steps, got[:5], want[:5])
            # prev chain is the kept sequence shifted (−1 terminal)
            assert int(prev_desc[-1]) == -1
            assert sorted(int(t) for t in prev_desc[:-1]) == want[:-1]

    def test_q_sample_matches(self):
        gd, _ = self._load()
        from lavie_tpu.diffusion.samplers import add_noise
        from lavie_tpu.diffusion.schedule import NoiseSchedule

        diff = gd.GaussianDiffusion(
            betas=gd.get_named_beta_schedule("linear", 1000),
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.FIXED_LARGE,
            loss_type=gd.LossType.MSE,
        )
        sched = NoiseSchedule.create("linear", 1000, 1e-4, 2e-2)
        g = torch.Generator().manual_seed(50)
        x = rand_t(g, 2, 3, 4, 4)
        noise = rand_t(g, 2, 3, 4, 4)
        t = torch.tensor([0, 777])
        want = diff.q_sample(x, t, noise=noise).numpy()
        got = add_noise(
            sched, jnp.asarray(x.numpy()), jnp.asarray(noise.numpy()),
            jnp.asarray(t.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_ddim_step_matches_spaced_chain(self):
        """One eta=0 DDIM step on the respaced chain, same fixed-eps model:
        the reference steps its REINDEXED tables at spaced index i; ours
        indexes the full table at (t, prev) — proven-equal forms."""
        gd, respace = self._load()
        from lavie_tpu.diffusion.samplers import ddim_step, spaced_timesteps
        from lavie_tpu.diffusion.schedule import NoiseSchedule

        spaced = self._spaced(gd, respace, 50)
        sched = NoiseSchedule.create("linear", 1000, 1e-4, 2e-2)
        ts_desc, prev_desc = spaced_timesteps(50, 1000)

        g = torch.Generator().manual_seed(51)
        x = rand_t(g, 2, 3, 4, 4)
        eps = rand_t(g, 2, 3, 4, 4)
        model = lambda xx, tt, **kw: eps

        for i in (0, 20, 49):  # spaced indices: first, middle, terminal
            # reference indexes the spaced chain by position
            spaced_i = len(ts_desc) - 1 - i  # ascending position of ts_desc[i]
            t_ref = torch.tensor([spaced_i, spaced_i])
            with torch.no_grad():
                want = spaced.ddim_sample(
                    model, x, t_ref, clip_denoised=False, eta=0.0
                )["sample"].numpy()
            got = ddim_step(
                sched, jnp.asarray(x.numpy()), jnp.asarray(eps.numpy()),
                jnp.asarray(int(ts_desc[i])), jnp.asarray(int(prev_desc[i])),
            )
            np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                       err_msg=f"spaced step i={i}")

    def test_ddpm_p_sample_matches_spaced_chain(self):
        """Ancestral DDPM step (FIXED_LARGE, the TSR p_sample_loop default)
        on the respaced chain — same eps model and same gaussian both sides,
        incl. the terminal step's zero-noise mask."""
        gd, respace = self._load()
        from lavie_tpu.diffusion.samplers import ddpm_step, spaced_timesteps
        from lavie_tpu.diffusion.schedule import NoiseSchedule

        spaced = self._spaced(gd, respace, 50)
        sched = NoiseSchedule.create("linear", 1000, 1e-4, 2e-2)
        ts_desc, prev_desc = spaced_timesteps(50, 1000)

        g = torch.Generator().manual_seed(52)
        x = rand_t(g, 2, 3, 4, 4)
        eps = rand_t(g, 2, 3, 4, 4)
        model = lambda xx, tt, **kw: eps

        for i in (0, 20, 48, 49):
            spaced_i = len(ts_desc) - 1 - i
            t_ref = torch.tensor([spaced_i, spaced_i])
            torch.manual_seed(777 + i)
            with torch.no_grad():
                want = spaced.p_sample(
                    model, x, t_ref, clip_denoised=False
                )["sample"].numpy()
            torch.manual_seed(777 + i)
            ref_noise = torch.randn_like(x)
            got = ddpm_step(
                sched, jnp.asarray(x.numpy()), jnp.asarray(eps.numpy()),
                jnp.asarray(int(ts_desc[i])), jnp.asarray(int(prev_desc[i])),
                jnp.asarray(ref_noise.numpy()),
                variance_type="fixed_large",
            )
            np.testing.assert_allclose(np.asarray(got), want, atol=3e-5,
                                       err_msg=f"spaced step i={i}")


class TestConditionedLossParity:
    def test_training_losses_masked_noise_aug(self):
        """reference: gaussian_diffusion.py:813-914 training_losses with
        mask + t_head (copy_no_mask=False): the model INPUT construction
        (clean conditioning channels :831, known-frame blending :835-836,
        augmented cond zeroed on generate slots :845-846) and the
        first-4-channels MSE :905 — same x/noise/t/t_head both sides.
        This test caught a polarity inversion in the aug-cond masking."""
        gd, _ = TestOpenAIDiffusionParity._load()
        from lavie_tpu.diffusion.schedule import NoiseSchedule
        from lavie_tpu.train.step import conditioned_diffusion_loss

        diff = gd.GaussianDiffusion(
            betas=gd.get_named_beta_schedule("linear", 1000),
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.FIXED_LARGE,
            loss_type=gd.LossType.MSE,
        )
        sched = NoiseSchedule.create("linear", 1000, 1e-4, 2e-2)

        g = torch.Generator().manual_seed(60)
        b, f, h, w = 2, 4, 4, 4
        latents_t = rand_t(g, b, 4, f, h, w)
        cond_t = rand_t(g, b, 4, f, h, w)
        # per-frame mask, 1 = generate (frames 2,3), 0 = known (frames 0,1)
        mask_fr = torch.tensor([0.0, 0.0, 1.0, 1.0])
        mask_t = mask_fr.view(1, 1, f, 1, 1).expand(b, 1, f, h, w)
        x_start_t = torch.cat([latents_t, mask_t, cond_t], dim=1)
        noise_t = rand_t(g, b, 9, f, h, w)      # full-tensor noise (ref noises all ch)
        aug_noise_t = rand_t(g, b, 4, f, h, w)  # t_head q_sample gaussian
        t_t = torch.tensor([123, 789])
        t_head_t = torch.tensor([17, 50])

        captured = {}

        def fake_model(x, t, **kw):
            captured["x"] = x.detach().clone()
            return torch.zeros_like(x[:, :4])

        # the reference q_samples with ITS OWN gaussian for t_head; inject by
        # monkeypatching randn_like? No — t_head path calls q_sample without
        # noise → th.randn_like. Pin torch's global generator instead.
        torch.manual_seed(1234)
        with torch.no_grad():
            terms = diff.training_losses(
                fake_model, x_start_t, t_t, noise=noise_t,
                mask=mask_t, t_head=t_head_t, copy_no_mask=False,
            )
        # recover the gaussian the reference drew for the aug q_sample so we
        # can feed the same one to our side
        torch.manual_seed(1234)
        ref_aug_noise = torch.randn_like(cond_t)

        def t2j5(x):  # (B, C, F, H, W) → (B, F, H, W, C)
            return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))

        got_inputs = {}

        def fake_apply(vars_, model_in, t, text, **kw):
            got_inputs["x"] = model_in
            return jnp.zeros(model_in.shape[:-1] + (4,), jnp.float32)

        loss, aux = conditioned_diffusion_loss(
            fake_apply, {}, sched,
            t2j5(latents_t), t2j5(cond_t), jnp.zeros((b, 7, 8)),
            jax.random.PRNGKey(0),
            mask=t2j5(mask_t)[..., :1],
            t=jnp.asarray(t_t.numpy()),
            noise_aug_schedule=sched,
            noise=t2j5(noise_t[:, :4]),
            aug_level=jnp.asarray(t_head_t.numpy()),
            aug_noise=t2j5(ref_aug_noise),
        )
        want_in = captured["x"].numpy().transpose(0, 2, 3, 4, 1)
        np.testing.assert_allclose(
            np.asarray(got_inputs["x"]), want_in, atol=1e-5
        )
        np.testing.assert_allclose(
            float(loss), float(terms["loss"].mean()), rtol=1e-5
        )
