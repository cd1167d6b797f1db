"""FVD — Fréchet Video Distance.

Re-implements the fork's FVD harness (reference:
base/pipelines/fine_tuning.py:751-847, ucf.py:126-197): extract per-video
features, fit Gaussians to real/generated feature sets, compute the Fréchet
distance with the scipy sqrtm covariance term (reference: ucf.py:189-196).

The reference substitutes torchvision R3D-18 penultimate features for I3D
(reference: fine_tuning.py:791-795): `r3d_18(pretrained=True)` with the
classifier stripped → 512-d global-avg-pooled features. The extractor here is
eval.r3d.R3D18 — the same architecture natively in flax, weights convertible
from the torchvision checkpoint via eval.r3d.convert_r3d18 (layout
parity-tested in tests/test_torch_parity.py). Random-init runs are
structural only.

Preprocessing follows the fork exactly: /255, center-crop 270, resize 224,
ImageNet mean/std (reference: ucf.py:126-156 — the fork uses ImageNet stats,
not torchvision's Kinetics stats).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

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


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def fvd_preprocess(
    videos: np.ndarray, num_frames: int = 16, crop: int = 270, size: int = 224
) -> np.ndarray:
    """uint8 (B, F, H, W, 3) → (B, num_frames, size, size, 3) normalized —
    the fork's exact recipe: /255, CenterCrop(270), Resize(224), ImageNet
    mean/std (reference: ucf.py:126-156)."""
    from lavie_tpu.data.transforms import resize_bilinear

    idx = np.linspace(0, videos.shape[1] - 1, num_frames).astype(int)
    clips = videos[:, idx].astype(np.float32) / 255.0
    h, w = clips.shape[2:4]
    # torchvision CenterCrop semantics: sides SMALLER than the crop are
    # zero-PADDED to it (not cropped to the min side) — F.center_crop pads
    # symmetrically before cropping. Matching this exactly keeps the R3D-18
    # features comparable to the reference recipe on <270 px videos.
    if h < crop or w < crop:
        ph, pw = max(crop - h, 0), max(crop - w, 0)
        clips = np.pad(
            clips,
            ((0, 0), (0, 0),
             (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
        )
        h, w = clips.shape[2:4]
    y0, x0 = (h - crop) // 2, (w - crop) // 2
    clips = clips[:, :, y0 : y0 + crop, x0 : x0 + crop]
    clips = np.stack([resize_bilinear(v, (size, size)) for v in clips])
    return (clips - IMAGENET_MEAN) / IMAGENET_STD


class FVDFeatureExtractor:
    """R3D-18 penultimate features, (B, F, H, W, 3) uint8 → (B, 512)."""

    def __init__(self, params: Optional[Any] = None, rng: Optional[jax.Array] = None,
                 num_frames: int = 16, size: int = 224, batch: int = 4):
        from lavie_tpu.eval.r3d import R3D18

        self.net = R3D18(features_only=True)
        self.num_frames = num_frames
        self.size = size
        self.batch = batch
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = jax.jit(self.net.init)(
                rng, jnp.zeros((1, num_frames, size, size, 3))
            )["params"]
        self.params = params
        self._fn = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    @classmethod
    def from_torchvision_state_dict(cls, state_dict, **kw) -> "FVDFeatureExtractor":
        """Build from a torchvision r3d_18 state dict (numpy tensors)."""
        from lavie_tpu.eval.r3d import convert_r3d18

        ext = cls(**kw)
        ext.params = convert_r3d18(jax.tree.map(np.asarray, ext.params), state_dict)
        return ext

    def __call__(self, videos: np.ndarray) -> np.ndarray:
        clips = fvd_preprocess(videos, self.num_frames, size=self.size)
        outs = []
        for i in range(0, clips.shape[0], self.batch):
            outs.append(np.asarray(self._fn(self.params, jnp.asarray(clips[i : i + self.batch]))))
        return np.concatenate(outs, axis=0)


def compute_fvd(
    real_videos: np.ndarray,
    generated_videos: np.ndarray,
    extractor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> float:
    """FVD between (B, F, H, W, 3) uint8 video batches
    (reference: ucf.py:173-197 with fine_tuning.py:791-847's flow)."""
    extractor = extractor or FVDFeatureExtractor()
    return frechet_distance(extractor(real_videos), extractor(generated_videos))
