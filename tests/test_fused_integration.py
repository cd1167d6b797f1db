"""Full tiny VSR-shaped UNet forward with ALL fused Pallas paths forced
(interpret mode) vs the plain XLA path — the regression net for kernel
interactions (cross_block head/tail + temporal_resblock + their wiring in
Transformer3D/TemporalModule3D).

The config is the smallest one that satisfies every kernel gate:
C = 128 (lane-aligned), heads = 2 × head_dim 64 (pair-packed kv), spatial
16×16 → 256 tokens (block-divisible), only-cross levels + temporal modules
as in the real VSR config.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.core.config import UNetConfig
from lavie_tpu.nn.unet import UNet3D

pytestmark = pytest.mark.slow


def _gate_compatible_cfg():
    return dataclasses.replace(
        UNetConfig.vsr(),
        block_out_channels=(128, 128, 128, 128),
        layers_per_block=1,
        num_attention_heads=2,   # 2 × 64 = 128 = C — pair-packed kv gate
        cross_attention_dim=128,
        norm_num_groups=32,
        rope_dim=8,
    )


def test_unet_forward_fused_matches_xla(monkeypatch):
    cfg = _gate_compatible_cfg()
    model = UNet3D(config=cfg)
    b, f, h, w = 1, 4, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels))
    t = jnp.array([7], jnp.int32)
    text = jax.random.normal(jax.random.PRNGKey(1), (b, 77, cfg.cross_attention_dim))
    labels = jnp.array([3], jnp.int32)

    monkeypatch.setenv("LAVIE_CROSS_BLOCK", "0")
    monkeypatch.setenv("LAVIE_TRESBLOCK", "0")
    params = model.init(jax.random.PRNGKey(2), x, t, text, class_labels=labels)
    ref = model.apply(params, x, t, text, class_labels=labels)

    monkeypatch.setenv("LAVIE_CROSS_BLOCK", "force")
    monkeypatch.setenv("LAVIE_TRESBLOCK", "force")
    out = model.apply(params, x, t, text, class_labels=labels)

    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=5e-4
    )
