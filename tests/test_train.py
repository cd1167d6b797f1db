"""Training-layer tests: LoRA mechanics, MappingNetwork, and the full
image-conditioned fine-tuning step on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lavie_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig
from lavie_tpu.diffusion import NoiseSchedule
from lavie_tpu.nn.clip import CLIPTextModel, CLIPVisionConfig, CLIPVisionModel
from lavie_tpu.nn.mapping import MappingNetwork
from lavie_tpu.nn.unet import UNet3D
from lavie_tpu.nn.vae import AutoencoderKL
from lavie_tpu.train import TrainState, make_train_step
from lavie_tpu.train.finetune import FinetuneConfig, LoRAFinetuner, alignment_loss
from lavie_tpu.train.lora import lora_init, lora_merge, lora_param_count, lora_target_paths


class TestLoRA:
    @pytest.fixture()
    def unet_params(self):
        cfg = UNetConfig.base_t2v().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 4))
        return model.init(
            jax.random.PRNGKey(0), x, jnp.array([1]),
            jnp.ones((1, 7, cfg.cross_attention_dim)),
        )["params"]

    def test_targets_found(self, unet_params):
        paths = lora_target_paths(unet_params)
        names = {p[-2] for p in paths}
        assert names == {"to_q", "to_k", "to_v", "to_out_0"}
        assert len(paths) > 20  # every attention in the UNet

    def test_merge_identity_at_init(self, unet_params):
        """B=0 at init → merged params equal base params exactly."""
        lora = lora_init(jax.random.PRNGKey(1), unet_params, rank=4)
        merged = lora_merge(unet_params, lora, alpha=4, rank=4)
        for a, b in zip(jax.tree.leaves(unet_params), jax.tree.leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_merge_changes_targets_only(self, unet_params):
        lora = lora_init(jax.random.PRNGKey(1), unet_params, rank=4)
        # set B nonzero
        lora = jax.tree.map(lambda x: jnp.ones_like(x), lora)
        merged = lora_merge(unet_params, lora, alpha=4, rank=4)
        flat_base = jax.tree_util.tree_flatten_with_path(unet_params)[0]
        flat_merged = dict(jax.tree_util.tree_flatten_with_path(merged)[0])
        changed = same = 0
        targets = ("to_q", "to_k", "to_v", "to_out_0")
        for path, base_leaf in flat_base:
            keys = [getattr(p, "key", str(p)) for p in path]
            m = flat_merged[path]
            is_target = len(keys) >= 2 and keys[-1] == "kernel" and keys[-2] in targets
            if is_target:
                assert not np.array_equal(np.asarray(base_leaf), np.asarray(m))
                changed += 1
            else:
                np.testing.assert_array_equal(np.asarray(base_leaf), np.asarray(m))
                same += 1
        assert changed > 20 and same > changed

    def test_param_count(self, unet_params):
        lora = lora_init(jax.random.PRNGKey(1), unet_params, rank=4)
        n = lora_param_count(lora)
        total = sum(x.size for x in jax.tree.leaves(unet_params))
        assert 0 < n < total * 0.2


class TestMappingNetwork:
    def test_shapes(self):
        m = MappingNetwork(input_dim=16, output_dim=8, num_layers=2, num_heads=2,
                           seq_len_in=5, seq_len_out=4)
        img = jnp.ones((2, 5, 16))
        txt = jnp.ones((2, 4, 8))
        params = m.init(jax.random.PRNGKey(0), img, txt)
        out = m.apply(params, img, txt)
        assert out.shape == (2, 4, 8)

    def test_image_affects_output(self):
        m = MappingNetwork(input_dim=16, output_dim=8, num_layers=2, num_heads=2,
                           seq_len_in=5, seq_len_out=4)
        rng = np.random.RandomState(0)
        img1 = jnp.asarray(rng.randn(1, 5, 16), jnp.float32)
        img2 = jnp.asarray(rng.randn(1, 5, 16), jnp.float32)
        txt = jnp.asarray(rng.randn(1, 4, 8), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), img1, txt)
        a = m.apply(params, img1, txt)
        b = m.apply(params, img2, txt)
        assert not np.array_equal(np.asarray(a), np.asarray(b))


class TestAlignmentLoss:
    def test_perfectly_aligned_orthogonal_batch_is_zero(self):
        """mapped_i == text_i with mutually orthogonal rows → both the positive
        (1−cos=0) and negative (cos≤0) terms vanish."""
        eye = jnp.eye(3, 8)[:, None, :]  # (3, 1, 8) one-hots
        x = jnp.repeat(eye, 4, axis=1)
        assert float(alignment_loss(x, x)) == pytest.approx(0.0, abs=1e-6)

    def test_misaligned_pairs_penalized(self):
        eye = jnp.repeat(jnp.eye(3, 8)[:, None, :], 4, axis=1)
        rolled = jnp.roll(eye, 1, axis=0)  # mapped_i == text_{i+1}: wrong pair
        assert float(alignment_loss(eye, rolled)) > float(alignment_loss(eye, eye))


class TestFinetuneStep:
    def test_one_step_updates_trainables_only(self):
        unet_cfg = UNetConfig.base_t2v().tiny()
        vae_cfg = VAEConfig.sd().tiny()
        text_cfg = CLIPTextConfig.vit_l().tiny()
        vis_cfg = CLIPVisionConfig().tiny()

        unet = UNet3D(config=unet_cfg)
        vae = AutoencoderKL(config=vae_cfg)
        text = CLIPTextModel(config=text_cfg)
        vision = CLIPVisionModel(config=vis_cfg)
        # mapper maps vision hidden (32) → text hidden (32), out 2·77? tiny:
        mapping = MappingNetwork(input_dim=32, output_dim=32, num_layers=1,
                                 num_heads=2, seq_len_in=5, seq_len_out=16)

        k = jax.random.split(jax.random.PRNGKey(0), 6)
        frozen = {
            "unet": unet.init(k[0], jnp.ones((1, 2, 8, 8, 4)), jnp.array([1]),
                              jnp.ones((1, 32, 32)))["params"],
            "vae": vae.init(k[1], jnp.ones((1, 64, 64, 3)))["params"],
            "text_encoder": text.init(k[2], jnp.zeros((1, 16), jnp.int32))["params"],
            "vision_encoder": vision.init(k[3], jnp.ones((1, 28, 28, 3)))["params"],
        }
        mapper_params = mapping.init(
            k[4], jnp.ones((1, 5, 32)), jnp.ones((1, 16, 32))
        )["params"]

        tuner = LoRAFinetuner(
            unet, vae, text, vision, mapping, frozen,
            FinetuneConfig(lora_rank=2, lora_alpha=2, learning_rate=1e-3),
        )
        state = tuner.init_state(k[5], mapper_params)
        batch = {
            "video": jnp.asarray(np.random.RandomState(0).rand(2, 2, 64, 64, 3) * 2 - 1,
                                 jnp.float32),
            "token_ids": jnp.zeros((2, 16), jnp.int32),
            "cond_image": jnp.ones((2, 28, 28, 3)),
        }
        step = tuner.jitted_step()
        new_state, metrics = step(state, frozen, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        # lora B started at zero; after one adamw step it must move
        b_leaves_before = [np.asarray(x["b"]) for x in _collect_lora(state.lora)]
        b_leaves_after = [np.asarray(x["b"]) for x in _collect_lora(new_state.lora)]
        moved = any(not np.array_equal(a, b) for a, b in zip(b_leaves_before, b_leaves_after))
        assert moved

    def test_checkpoint_rotation_and_resume(self, tmp_path):
        import flax

        unet_cfg = UNetConfig.base_t2v().tiny()
        unet = UNet3D(config=unet_cfg)
        params = unet.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 16, 16, 4)),
                           jnp.array([1]), jnp.ones((1, 7, 32)))["params"]
        mapping = MappingNetwork(input_dim=8, output_dim=8, num_layers=1, num_heads=1,
                                 seq_len_in=2, seq_len_out=2)
        mp = mapping.init(jax.random.PRNGKey(1), jnp.ones((1, 2, 8)), jnp.ones((1, 2, 8)))["params"]
        tuner = LoRAFinetuner(
            unet, None, None, None, mapping, {"unet": params},
            FinetuneConfig(lora_rank=2, checkpoints_total_limit=2),
        )
        state = tuner.init_state(jax.random.PRNGKey(2), mp)
        import dataclasses as dc
        for s in (10, 20, 30):
            state = state.replace(step=jnp.asarray(s))
            tuner.save_checkpoint(str(tmp_path), state)
        import os
        ckpts = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint-"))
        assert ckpts == ["checkpoint-20", "checkpoint-30"]  # rotation keeps 2
        restored, ok = tuner.load_latest_checkpoint(str(tmp_path), state)
        assert ok and int(restored.step) == 30


def _collect_lora(tree):
    out = []
    if isinstance(tree, dict):
        if "lora" in tree:
            out.append(tree["lora"])
        for v in tree.values():
            if isinstance(v, dict):
                out.extend(_collect_lora(v))
    return out


class TestMappingTrainer:
    def test_step_reduces_loss(self):
        """Standalone mapper training (reference: base/pipelines/mapping.py:
        101-276): MSE + in-batch-negative cosine toward the caption states;
        optimizer touches the mapper only."""
        import optax

        from lavie_tpu.core.config import CLIPTextConfig
        from lavie_tpu.nn.clip import (
            CLIPTextModel,
            CLIPVisionConfig,
            CLIPVisionModel,
        )
        from lavie_tpu.nn.mapping import MappingNetwork
        from lavie_tpu.train.mapping_trainer import make_mapping_train_step

        tcfg = CLIPTextConfig.vit_l().tiny()
        vcfg = CLIPVisionConfig().tiny()
        text = CLIPTextModel(config=tcfg)
        vision = CLIPVisionModel(config=vcfg)
        mapping = MappingNetwork(
            input_dim=vcfg.hidden_size, output_dim=tcfg.hidden_size,
            num_layers=1, num_heads=2, seq_len_in=vcfg.num_positions,
            seq_len_out=7, ffn_dim=32,
        )
        rng = jax.random.PRNGKey(0)
        tokens = jnp.ones((2, 7), jnp.int32)
        pixels = jnp.ones((2, vcfg.image_size, vcfg.image_size, 3))
        frozen = {
            "text_encoder": text.init(rng, tokens)["params"],
            "vision_encoder": vision.init(rng, pixels)["params"],
        }
        ts = text.apply({"params": frozen["text_encoder"]}, tokens)
        vs = vision.apply({"params": frozen["vision_encoder"]}, pixels)
        mp = mapping.init(rng, vs, ts)["params"]

        opt = optax.adam(1e-3)
        step = make_mapping_train_step(mapping, text, vision, opt)
        opt_state = opt.init(mp)
        batch = {"token_ids": tokens, "pixel_values": pixels}
        losses = []
        for _ in range(5):
            mp, opt_state, metrics = step(mp, opt_state, frozen, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


def test_finetuner_default_schedule_is_sd_training_schedule():
    """The fork trains against DDPMScheduler.from_pretrained(SD-1.4) with no
    overrides — scaled_linear beta(0.00085, 0.012)
    (reference: base/pipelines/fine_tuning.py:281), NOT the linear sampling
    schedule from the YAML."""
    from lavie_tpu.diffusion import NoiseSchedule

    got = None
    # construct without running: LoRAFinetuner needs models; check the
    # default expression directly against the known SD table instead
    s = NoiseSchedule.create("scaled_linear", 1000, 0.00085, 0.012)
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    np.testing.assert_allclose(
        np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
    )

    import inspect

    from lavie_tpu.train.finetune import LoRAFinetuner

    src = inspect.getsource(LoRAFinetuner.__init__)
    assert 'NoiseSchedule.create(\n            "scaled_linear", 1000, 0.00085, 0.012\n        )' in src
