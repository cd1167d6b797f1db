"""CLIPSIM — CLIP text↔frame similarity for generated videos.

Re-implements the fork's MSR-VTT CLIPSIM harness (reference:
base/pipelines/fine_tuning.py:717-749, 860-892; evaluation.py:73-83): embed
each frame and the prompt with the REAL CLIP scoring model — EOS-pooled text
embedding through `text_projection`, post-LN CLS-pooled image embedding
through `visual_projection` — and average the per-frame cosine similarities.

The scorer is nn.clip.CLIPDualEncoder; weights convert from a
transformers.CLIPModel state dict via io.convert.convert_clip_dual_encoder
(parity-tested against transformers in tests/test_torch_parity.py).
Weight-free runs use random init and are structural only.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.core.config import CLIPTextConfig
from lavie_tpu.io.tokenizer import CLIPTokenizer
from lavie_tpu.nn.clip import CLIPDualEncoder, CLIPVisionConfig

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(frames: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8 (F,H,W,3) → CLIP-normalized (F,image_size,image_size,3).

    Matches the `clip` package preprocessing the reference scores with
    (reference: base/pipelines/fine_tuning.py:718 `clip.load` preprocess,
    evaluation.py:76): BICUBIC resize of the SHORTER side to image_size,
    center crop, /255, CLIP mean/std."""
    import jax

    f, h, w, _ = frames.shape
    scale = image_size / min(h, w)
    nh, nw = max(image_size, int(round(h * scale))), max(image_size, int(round(w * scale)))
    x = jax.image.resize(
        jnp.asarray(frames, jnp.float32), (f, nh, nw, 3), method="cubic"
    )
    y0, x0 = (nh - image_size) // 2, (nw - image_size) // 2
    x = x[:, y0 : y0 + image_size, x0 : x0 + image_size]
    x = np.asarray(x) / 255.0
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


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
        self.model = CLIPDualEncoder(
            text_config=text_config, vision_config=vision_config
        )
        self.tokenizer = CLIPTokenizer(
            max_length=text_config.max_position_embeddings,
            vocab_size=text_config.vocab_size,
        )
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            ids = jnp.zeros((1, text_config.max_position_embeddings), jnp.int32)
            px = jnp.zeros((1, vision_config.image_size, vision_config.image_size, 3))
            params = jax.jit(self.model.init)(rng, ids, px)["params"]
        self.params = params

        @jax.jit
        def _score(params, token_ids, frames):
            t = self.model.apply(
                {"params": params}, token_ids, method=CLIPDualEncoder.get_text_embeds
            )
            v = self.model.apply(
                {"params": params}, frames, method=CLIPDualEncoder.get_image_embeds
            )
            t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
            v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)
            return jnp.mean(v @ t.T)

        self._score = _score

    @classmethod
    def from_transformers_state_dict(
        cls,
        state_dict,
        text_config: CLIPTextConfig = CLIPTextConfig.vit_l(),
        vision_config: CLIPVisionConfig = CLIPVisionConfig(),
    ) -> "CLIPSimilarityScorer":
        """Build from a transformers.CLIPModel state dict (numpy tensors)."""
        from lavie_tpu.io.convert import convert_clip_dual_encoder

        scorer = cls(text_config, vision_config)
        scorer.params = convert_clip_dual_encoder(
            jax.tree.map(np.asarray, scorer.params), state_dict
        )
        return scorer

    def score(self, video: np.ndarray, prompt: str) -> float:
        """video: (F,H,W,3) uint8 → mean frame↔prompt cosine similarity."""
        frames = jnp.asarray(clip_preprocess(video, self.vision_config.image_size))
        ids = jnp.asarray(self.tokenizer([prompt]))
        return float(self._score(self.params, ids, frames))

    def score_batch(self, videos: Sequence[np.ndarray], prompts: Sequence[str]) -> float:
        return float(np.mean([self.score(v, p) for v, p in zip(videos, prompts)]))
