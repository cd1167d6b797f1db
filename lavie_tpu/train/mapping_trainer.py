"""Standalone MappingNetwork training.

The fork trains the mapper alone on (image, caption) pairs before the joint
LoRA phase (reference: base/pipelines/mapping.py:101-276, Flickr captions):
cosine-embedding loss pulling mapped image tokens toward the caption's text
states with in-batch negatives. One jitted step; optimizer on the mapper only.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from lavie_tpu.nn.clip import CLIPTextModel, CLIPVisionModel
from lavie_tpu.nn.mapping import MappingNetwork
from lavie_tpu.train.finetune import alignment_loss


def make_mapping_train_step(
    mapping: MappingNetwork,
    text_encoder: CLIPTextModel,
    vision_encoder: CLIPVisionModel,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """step(mapper_params, opt_state, frozen, batch) → (params, opt_state, loss).

    batch: {"token_ids": (B,77), "pixel_values": (B,H,W,3)}."""

    def loss_fn(mapper_params, frozen, batch):
        text_states = text_encoder.apply(
            {"params": frozen["text_encoder"]}, batch["token_ids"]
        )
        image_states = vision_encoder.apply(
            {"params": frozen["vision_encoder"]}, batch["pixel_values"]
        )
        mapped = mapping.apply({"params": mapper_params}, image_states, text_states)
        # primary: per-token MSE toward the text states (teacher-forced target)
        mse = jnp.mean((mapped - text_states) ** 2)
        # contrastive: ±cosine with in-batch negatives
        # (reference: mapping.py:162-173)
        contrast = alignment_loss(mapped, text_states)
        return mse + contrast, (mse, contrast)

    def step(mapper_params, opt_state, frozen, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            mapper_params, frozen, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, mapper_params)
        mapper_params = optax.apply_updates(mapper_params, updates)
        return mapper_params, opt_state, {"loss": loss, "mse": aux[0], "contrast": aux[1]}

    return jax.jit(step)
