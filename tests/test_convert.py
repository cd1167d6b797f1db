"""Checkpoint conversion tests: export→convert round trips and the 2D→3D
surgery semantics (temporal keys absent, conv_in widening)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig
from lavie_tpu.io.convert import (
    convert_clip_text,
    convert_state_dict,
    export_state_dict,
    flax_path_to_torch_key,
)
from lavie_tpu.nn.clip import CLIPTextModel
from lavie_tpu.nn.unet import UNet3D
from lavie_tpu.nn.vae import AutoencoderKL


def tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


class TestKeyMapping:
    def test_unet_paths(self):
        cases = {
            ("conv_in", "conv", "kernel"): "conv_in.weight",
            ("time_embedding", "linear_1", "kernel"): "time_embedding.linear_1.weight",
            ("down_blocks_0", "resnets_1", "norm1", "norm", "scale"):
                "down_blocks.0.resnets.1.norm1.weight",
            ("down_blocks_0", "downsamplers_0", "conv", "conv", "kernel"):
                "down_blocks.0.downsamplers.0.conv.weight",
            ("down_blocks_0", "attentions_1", "norm", "norm", "scale"):
                "down_blocks.0.attentions.1.norm.weight",
            ("down_blocks_0", "attentions_1", "transformer_blocks_0", "attn1",
             "to_out_0", "kernel"):
                "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_out.0.weight",
            ("mid_block", "attentions_0", "transformer_blocks_0", "ff",
             "net_0_proj", "kernel"):
                "mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
            ("up_blocks_3", "upsamplers_0", "conv", "conv", "bias"):
                "up_blocks.3.upsamplers.0.conv.bias",
            ("conv_norm_out", "norm", "scale"): "conv_norm_out.weight",
            ("down_blocks_0", "attentions_0", "transformer_blocks_0", "attn_temp",
             "time_rel_pos_bias", "relative_attention_bias", "embedding"):
                "down_blocks.0.attentions.0.transformer_blocks.0.attn_temp."
                "time_rel_pos_bias.relative_attention_bias.weight",
            ("class_embedding", "embedding"): "class_embedding.weight",
        }
        for path, expected in cases.items():
            assert flax_path_to_torch_key(path) == expected

    def test_vae_paths(self):
        cases = {
            ("encoder", "down_blocks_0_resnets_1", "conv1", "kernel"):
                "encoder.down_blocks.0.resnets.1.conv1.weight",
            ("encoder", "down_blocks_2_downsample", "kernel"):
                "encoder.down_blocks.2.downsamplers.0.conv.weight",
            ("decoder", "up_blocks_1_upsample", "kernel"):
                "decoder.up_blocks.1.upsamplers.0.conv.weight",
            ("decoder", "mid_resnet_0", "norm1", "norm", "scale"):
                "decoder.mid_block.resnets.0.norm1.weight",
            ("encoder", "mid_attn", "query", "kernel"):
                "encoder.mid_block.attentions.0.query.weight",
            ("quant_conv", "kernel"): "quant_conv.weight",
        }
        for path, expected in cases.items():
            assert flax_path_to_torch_key(path) == expected


@pytest.mark.slow
class TestRoundTrip:
    def test_unet_roundtrip(self):
        cfg = UNetConfig.base_t2v().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 4))
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([1]),
                            jnp.ones((1, 7, cfg.cross_attention_dim)))["params"]
        sd = export_state_dict(params)
        # every exported key looks like a diffusers key (no flax artifacts)
        for k in sd:
            assert "kernel" not in k and "_0." not in k.replace("net.0.", ""), k
        restored = convert_state_dict(params, sd)
        tree_equal(params, restored)

    def test_unet_2d_surgery_temporal_missing(self):
        """Dropping all temporal keys from the checkpoint must still convert,
        keeping the fresh init (zero out-proj)."""
        cfg = UNetConfig.base_t2v().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 4))
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([1]),
                            jnp.ones((1, 7, cfg.cross_attention_dim)))["params"]
        sd = export_state_dict(params)
        sd_2d = {k: v for k, v in sd.items()
                 if "attn_temp" not in k and "norm_temp" not in k}
        assert len(sd_2d) < len(sd)
        restored = convert_state_dict(params, sd_2d)
        tree_equal(params, restored)

    def test_missing_nontemporal_raises(self):
        cfg = UNetConfig.base_t2v().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 4))
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([1]),
                            jnp.ones((1, 7, cfg.cross_attention_dim)))["params"]
        sd = export_state_dict(params)
        del sd["conv_in.weight"]
        with pytest.raises(KeyError):
            convert_state_dict(params, sd)

    def test_conv_in_widening(self):
        """Interpolation UNet: a 4-channel conv_in checkpoint loads into an
        8-channel model with zero-filled extra channels
        (reference: interpolation/models/unet.py:519-530)."""
        cfg = UNetConfig.interpolation().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 8))
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([1]),
                            jnp.ones((1, 7, cfg.cross_attention_dim)))["params"]
        sd = export_state_dict(params)
        # shrink conv_in to 4 input channels, as an SD 2D checkpoint would have
        w = sd["conv_in.weight"]  # torch layout (O, I, kh, kw)
        sd["conv_in.weight"] = w[:, :4]
        restored = convert_state_dict(params, sd)
        got = np.asarray(restored["conv_in"]["conv"]["kernel"])  # (kh,kw,I,O)
        np.testing.assert_allclose(got[:, :, 4:], 0.0)
        np.testing.assert_allclose(got[:, :, :4], np.asarray(params["conv_in"]["conv"]["kernel"])[:, :, :4])

    def test_vae_roundtrip(self):
        cfg = VAEConfig.sd().tiny()
        model = AutoencoderKL(config=cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))["params"]
        sd = export_state_dict(params)
        assert "encoder.down_blocks.0.resnets.0.conv1.weight" in sd
        restored = convert_state_dict(params, sd)
        tree_equal(params, restored)

    def test_vae_new_era_attention_keys(self):
        """diffusers ≥0.15 stores the VAE mid attention as to_q/to_k/to_v/
        to_out.0; both eras must load to the same params — and the UNet's
        mid_block.attentions.N.transformer_blocks.M.attn1.to_q (a legitimate
        to_q) must NOT be touched by the remap."""
        from lavie_tpu.io.convert import normalize_reference_keys

        cfg = VAEConfig.sd().tiny()
        model = AutoencoderKL(config=cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))["params"]
        sd = export_state_dict(params)
        renames = {
            ".query.": ".to_q.", ".key.": ".to_k.", ".value.": ".to_v.",
            ".proj_attn.": ".to_out.0.",
        }
        new_sd = {}
        for k, v in sd.items():
            if "mid_block.attentions" in k:
                for old, new in renames.items():
                    k = k.replace(old, new)
            new_sd[k] = v
        assert "encoder.mid_block.attentions.0.to_q.weight" in new_sd
        restored = convert_state_dict(params, new_sd)
        tree_equal(params, restored)

        unet_key = (
            "mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight"
        )
        out = normalize_reference_keys({unet_key: np.zeros((4, 4))})
        assert unet_key in out

    def test_clip_roundtrip_with_hf_nesting(self):
        cfg = CLIPTextConfig.vit_l().tiny()
        model = CLIPTextModel(config=cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16), dtype=jnp.int32))["params"]
        sd = export_state_dict(params)
        # re-nest as HF would name them
        hf_sd = {}
        for k, v in sd.items():
            if k.startswith("token_embedding"):
                k = "embeddings." + k
            elif k == "position_embedding":
                k = "embeddings.position_embedding.weight"
            elif k.startswith("layers."):
                k = "encoder." + k
            hf_sd["text_model." + k] = v
        restored = convert_clip_text(params, hf_sd)
        tree_equal(params, restored)


@pytest.mark.slow
class TestVSRConversion:
    def test_vsr_unet_roundtrip_with_temporal_modules(self):
        """VSR UNet incl. down/mid/up temporal modules (3D conv kernels,
        shift convs) must round-trip through the torch key mapping."""
        cfg = UNetConfig.vsr().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 7))
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.array([1]),
            jnp.ones((1, 7, cfg.cross_attention_dim)), jnp.array([5]),
        )["params"]
        sd = export_state_dict(params)
        assert "down_temporal_blocks.0.resblocks_3d_t.conv1.weight" in sd
        assert "mid_temporal_block.shift_conv.weight" in sd
        assert "class_embedding.weight" in sd
        # 3D conv kernels transpose (O,I,kf,kh,kw) <-> (kf,kh,kw,I,O)
        assert sd["down_temporal_blocks.0.resblocks_3d_t.conv1.weight"].ndim == 5
        restored = convert_state_dict(params, sd)
        tree_equal(params, restored)

    def test_vsr_2d_checkpoint_keeps_temporal_init(self):
        """An x4-upscaler 2D checkpoint (no temporal keys) loads with fresh
        temporal modules (reference freeze_pretrained_2d_upsampler flow,
        vsr/models/unet.py:633-645)."""
        cfg = UNetConfig.vsr().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 7))
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.array([1]),
            jnp.ones((1, 7, cfg.cross_attention_dim)), jnp.array([5]),
        )["params"]
        sd = export_state_dict(params)
        sd_2d = {k: v for k, v in sd.items()
                 if "temporal_block" not in k and "attn_temp" not in k
                 and "norm_temp" not in k}
        restored = convert_state_dict(params, sd_2d)
        tree_equal(params, restored)
