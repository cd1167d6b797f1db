"""CFG caption dropout + tiled VAE encode (reference: base/models/clip.py:61-88,
vsr/models/autoencoder_kl.py:214-258)."""

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.core.config import CLIPTextConfig, VAEConfig
from lavie_tpu.nn.clip import TextEmbedder, token_drop
from lavie_tpu.nn.vae import AutoencoderKL


def test_token_drop_statistics_and_force():
    ids = jnp.tile(jnp.arange(8)[None], (1000, 1))
    uncond = jnp.full((8,), 99, jnp.int32)
    out = token_drop(ids, uncond, jax.random.PRNGKey(0), drop_prob=0.3)
    dropped = np.asarray(out[:, 0] == 99)
    assert 0.2 < dropped.mean() < 0.4
    # whole rows are replaced, never partially
    mixed = np.asarray(((out == 99).sum(axis=1) % 8) != 0)
    assert not mixed.any()
    # force_drop overrides randomness
    force = jnp.array([True, False] * 500)
    out = token_drop(ids, uncond, jax.random.PRNGKey(0), 0.0, force_drop=force)
    np.testing.assert_array_equal(np.asarray(out[:, 0] == 99), np.asarray(force))


def test_text_embedder_dropout_changes_states():
    cfg = CLIPTextConfig().tiny()
    m = TextEmbedder(config=cfg, dropout_prob=1.0)
    ids = jnp.ones((2, cfg.max_position_embeddings), jnp.int32) * 5
    uncond = jnp.zeros((cfg.max_position_embeddings,), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    plain = m.apply(params, ids)
    dropped = m.apply(params, ids, uncond_ids=uncond, rng=jax.random.PRNGKey(1), train=True)
    assert np.abs(np.asarray(plain) - np.asarray(dropped)).max() > 1e-3
    # drop_prob=1 → identical to encoding the uncond ids directly
    uncond_batch = jnp.zeros_like(ids)
    ref = m.apply(params, uncond_batch)
    np.testing.assert_allclose(np.asarray(dropped), np.asarray(ref), atol=1e-6)


def test_tiled_encode_stitching_exact_for_local_encoder():
    """tiled_encode is approximate on real encoders (per-tile GroupNorm
    statistics + conv halo — the same approximation the reference's
    tiled_encode makes, vsr/models/autoencoder_kl.py:214-258). The STITCHING
    itself (tile placement, ramp weights summing to 1) must be exact: with a
    purely local encoder (4× average pool) tiled == full bit-for-bit up to
    fp roundoff."""
    cfg = VAEConfig.vsr().tiny()
    vae = AutoencoderKL(config=cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), x)

    f = cfg.downscale_factor
    lc = cfg.latent_channels

    def local_encode(self, img):
        n, h, w, _ = img.shape
        pooled = img.reshape(n, h // f, f, w // f, f, 3).mean(axis=(2, 4))
        mean = jnp.tile(pooled, (1, 1, 1, 2))[..., :lc]
        return mean, jnp.zeros_like(mean)

    orig = AutoencoderKL.encode
    AutoencoderKL.encode = local_encode
    try:
        mean_full, _ = vae.apply(params, x, method=AutoencoderKL.encode)
        mean_t, _ = vae.apply(
            params, x, tile=32, overlap=16, method=AutoencoderKL.tiled_encode
        )
    finally:
        AutoencoderKL.encode = orig
    assert mean_t.shape == mean_full.shape
    np.testing.assert_allclose(np.asarray(mean_t), np.asarray(mean_full), atol=1e-5)


def test_tiled_encode_small_input_passthrough():
    cfg = VAEConfig.vsr().tiny()
    vae = AutoencoderKL(config=cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), x)
    m1, _ = vae.apply(params, x, tile=64, method=AutoencoderKL.tiled_encode)
    m2, _ = vae.apply(params, x, method=AutoencoderKL.encode)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
