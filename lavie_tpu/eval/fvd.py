"""FVD — Fréchet Video Distance.

Re-implements the fork's FVD harness (reference:
base/pipelines/fine_tuning.py:751-847, ucf.py:126-197): extract per-video
features, fit Gaussians to real/generated feature sets, compute the Fréchet
distance with the scipy sqrtm covariance term (reference: ucf.py:189-196).

The reference substitutes torchvision R3D-18 penultimate features for I3D
(reference: fine_tuning.py:791-793). torchvision is not in this image, so the
feature extractor is pluggable: `Conv3DFeatureNet` is a small flax 3D-conv
tower with the same (B, F, H, W, 3) → (B, D) contract; converted R3D-18
weights slot in when available.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6) -> float:
    """Fréchet distance between Gaussians fit to two feature sets
    (reference: ucf.py:173-197)."""
    from scipy import linalg

    mu1, mu2 = feats_a.mean(axis=0), feats_b.mean(axis=0)
    sigma1 = np.cov(feats_a, rowvar=False)
    sigma2 = np.cov(feats_b, rowvar=False)

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class Conv3DFeatureNet(nn.Module):
    """Small R3D-style 3D-conv feature tower: (B, F, H, W, 3) → (B, features).
    Channels-last; strided 3D convs halve space (and time from stage 2)."""

    widths: Sequence[int] = (32, 64, 128, 256)
    features: int = 400

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, w in enumerate(self.widths):
            strides = (1, 2, 2) if i == 0 else (2, 2, 2)
            x = nn.Conv(w, (3, 3, 3), strides=strides, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"norm{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # global average pool
        return nn.Dense(self.features, name="head")(x)


class FVDFeatureExtractor:
    def __init__(self, params: Optional[Any] = None, rng: Optional[jax.Array] = None,
                 num_frames: int = 16, size: int = 112):
        self.net = Conv3DFeatureNet()
        self.num_frames = num_frames
        self.size = size
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = jax.jit(self.net.init)(
                rng, jnp.zeros((1, num_frames, size, size, 3))
            )["params"]
        self.params = params
        self._fn = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    def __call__(self, videos: np.ndarray) -> np.ndarray:
        """videos: (B, F, H, W, 3) uint8 → (B, D) features. Uniformly samples
        num_frames and resizes to size×size (reference: ucf.py:126-156)."""
        from lavie_tpu.data.transforms import resize_bilinear

        b = videos.shape[0]
        idx = np.linspace(0, videos.shape[1] - 1, self.num_frames).astype(int)
        clips = videos[:, idx].astype(np.float32) / 127.5 - 1.0
        clips = np.stack([resize_bilinear(c, (self.size, self.size)) for c in clips])
        return np.asarray(self._fn(self.params, jnp.asarray(clips)))


def compute_fvd(
    real_videos: np.ndarray,
    generated_videos: np.ndarray,
    extractor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> float:
    """FVD between (B, F, H, W, 3) uint8 video batches
    (reference: ucf.py:173-197 with fine_tuning.py:791-847's flow)."""
    extractor = extractor or FVDFeatureExtractor()
    return frechet_distance(extractor(real_videos), extractor(generated_videos))
