"""Standalone MappingNetwork training CLI.

The fork pre-trains the mapper on (image, caption) pairs before the joint
LoRA phase (reference: base/pipelines/mapping.py:101-276, `training_mapping`).

    python -m lavie_tpu.cli.train_mapping --config configs/finetune.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lavie_tpu.core.config import CLIPTextConfig, load_yaml_config
from lavie_tpu.utils.logging import MetricLogger, create_logger


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args(argv)
    cfg = load_yaml_config(args.config)

    from lavie_tpu.data import DataLoader, VideoFolderDataset
    from lavie_tpu.eval.clipsim import clip_preprocess
    from lavie_tpu.io.checkpoints import save_orbax
    from lavie_tpu.io.tokenizer import CLIPTokenizer
    from lavie_tpu.nn.clip import CLIPTextModel, CLIPVisionConfig, CLIPVisionModel
    from lavie_tpu.nn.mapping import MappingNetwork
    from lavie_tpu.train.mapping_trainer import make_mapping_train_step

    tiny = cfg.get("model_scale", "full") == "tiny"
    text_cfg = CLIPTextConfig.vit_l().tiny() if tiny else CLIPTextConfig.vit_l()
    vis_cfg = CLIPVisionConfig().tiny() if tiny else CLIPVisionConfig()

    text = CLIPTextModel(config=text_cfg)
    vision = CLIPVisionModel(config=vis_cfg)
    mapping = MappingNetwork(
        input_dim=vis_cfg.hidden_size,
        output_dim=text_cfg.hidden_size,
        num_layers=2 if tiny else 12,
        num_heads=2 if tiny else 12,
        seq_len_in=vis_cfg.num_positions,
        seq_len_out=text_cfg.max_position_embeddings,
    )
    tokenizer = CLIPTokenizer(
        max_length=text_cfg.max_position_embeddings, vocab_size=text_cfg.vocab_size
    )

    k = jax.random.split(jax.random.PRNGKey(cfg.get("seed") or 0), 3)
    frozen = {
        "text_encoder": jax.jit(text.init)(
            k[0], jnp.zeros((1, text_cfg.max_position_embeddings), jnp.int32)
        )["params"],
        "vision_encoder": jax.jit(vision.init)(
            k[1], jnp.zeros((1, vis_cfg.image_size, vis_cfg.image_size, 3))
        )["params"],
    }
    mapper_params = jax.jit(mapping.init)(
        k[2],
        jnp.zeros((1, vis_cfg.num_positions, vis_cfg.hidden_size)),
        jnp.zeros((1, text_cfg.max_position_embeddings, text_cfg.hidden_size)),
    )["params"]

    optimizer = optax.adamw(cfg.get("learning_rate", 1e-4))
    opt_state = optimizer.init(mapper_params)
    step_fn = make_mapping_train_step(mapping, text, vision, optimizer)

    # (image, caption) pairs: mid-frames from a video folder stand in for the
    # reference's Flickr pairs when only videos are available
    ds = VideoFolderDataset(
        cfg["train_data_dir"], num_frames=2,
        size=(vis_cfg.image_size, vis_cfg.image_size),
    )
    dl = DataLoader(ds, batch_size=cfg.get("train_batch_size", 4), num_workers=2)

    logger = create_logger(cfg.get("logging_dir", "logs"), name="mapping")
    metrics = MetricLogger(cfg.get("logging_dir", "logs"), "mapping_metrics.jsonl")
    max_steps = cfg.get("max_train_steps") or 10
    step = 0
    for epoch in range(cfg.get("num_train_epochs", 1)):
        for batch_np in dl:
            images = np.stack([
                clip_preprocess(((f + 1) * 127.5).astype(np.uint8)[None],
                                vis_cfg.image_size)[0]
                for f in batch_np["cond_frame"]
            ])
            batch = {
                "token_ids": jnp.asarray(tokenizer(batch_np["caption"])),
                "pixel_values": jnp.asarray(images),
            }
            mapper_params, opt_state, m = step_fn(mapper_params, opt_state, frozen, batch)
            step += 1
            logger.info(
                f"step {step}: loss={float(m['loss']):.4f} mse={float(m['mse']):.4f} "
                f"contrast={float(m['contrast']):.4f}"
            )
            metrics.log(step, m)
            if step >= max_steps:
                break
        if step >= max_steps:
            break

    out_dir = cfg.get("output_dir", "./checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    save_orbax(os.path.join(out_dir, "mapper"), mapper_params)
    logger.info(f"saved mapper to {out_dir}/mapper")


if __name__ == "__main__":
    main()
