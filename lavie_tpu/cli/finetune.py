"""Fine-tuning CLI — the fork's research entry point.

Mirrors the reference's method switch (reference:
base/pipelines/fine_tuning.py:455-847): method 1 = LoRA+mapper training,
2 = inference with the tuned weights, 3 = CLIPSIM eval, 4 = FVD eval.

    python -m lavie_tpu.cli.finetune --config configs/finetune.yaml --method 1
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.core.config import (
    CLIPTextConfig,
    SamplingConfig,
    UNetConfig,
    VAEConfig,
    load_yaml_config,
)
from lavie_tpu.utils.logging import MetricLogger, create_logger


def _build(cfg):
    from lavie_tpu.nn.clip import CLIPTextModel, CLIPVisionConfig, CLIPVisionModel
    from lavie_tpu.nn.mapping import MappingNetwork
    from lavie_tpu.nn.unet import UNet3D
    from lavie_tpu.nn.vae import AutoencoderKL
    from lavie_tpu.train.finetune import FinetuneConfig, LoRAFinetuner

    tiny = cfg.get("model_scale", "full") == "tiny"
    mk = (lambda c: c.tiny()) if tiny else (lambda c: c)
    unet_cfg = mk(UNetConfig.base_t2v())
    vae_cfg = mk(VAEConfig.sd())
    text_cfg = mk(CLIPTextConfig.vit_l())
    vis_cfg = CLIPVisionConfig().tiny() if tiny else CLIPVisionConfig()

    unet = UNet3D(config=unet_cfg)
    vae = AutoencoderKL(config=vae_cfg)
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

    k = jax.random.split(jax.random.PRNGKey(cfg.get("seed") or 0), 5)
    size = 64 if tiny else 320
    frozen = {
        "unet": jax.jit(unet.init)(
            k[0], jnp.zeros((1, 2, 8, 8, unet_cfg.in_channels)), jnp.array([0]),
            jnp.zeros((1, text_cfg.max_position_embeddings, unet_cfg.cross_attention_dim)),
        )["params"],
        "vae": jax.jit(vae.init)(k[1], jnp.zeros((1, size, size, 3)))["params"],
        "text_encoder": jax.jit(text.init)(
            k[2], jnp.zeros((1, text_cfg.max_position_embeddings), jnp.int32)
        )["params"],
        "vision_encoder": jax.jit(vision.init)(
            k[3], jnp.zeros((1, vis_cfg.image_size, vis_cfg.image_size, 3))
        )["params"],
    }
    ckpt = cfg.get("ckpt_path")
    if ckpt and os.path.exists(str(ckpt)):
        from lavie_tpu.io.checkpoints import load_pipeline_params

        frozen.update(
            load_pipeline_params(
                {kk: frozen[kk] for kk in ("unet", "vae", "text_encoder")},
                ckpt,
                cfg.get("pretrained_path"),
            )
        )
    else:
        print("[lavie_tpu] no base checkpoint — training from random init", file=sys.stderr)

    mapper_params = jax.jit(mapping.init)(
        k[4],
        jnp.zeros((1, vis_cfg.num_positions, vis_cfg.hidden_size)),
        jnp.zeros((1, text_cfg.max_position_embeddings, text_cfg.hidden_size)),
    )["params"]

    ft_cfg = FinetuneConfig(
        lora_rank=cfg.get("rank", 16),
        learning_rate=cfg.get("learning_rate", 1e-4),
        gradient_accumulation_steps=cfg.get("gradient_accumulation_steps", 1),
        min_snr_gamma=cfg.get("snr_gamma", 5),
        max_grad_norm=cfg.get("max_grad_norm", 1.0),
        checkpointing_steps=cfg.get("checkpointing_steps", 504),
        checkpoints_total_limit=cfg.get("checkpoints_total_limit", 3),
    )
    tuner = LoRAFinetuner(unet, vae, text, vision, mapping, frozen, ft_cfg)
    return tuner, frozen, mapper_params, text_cfg, vis_cfg


def train(cfg):
    from lavie_tpu.data import DataLoader, MSVDDataset
    from lavie_tpu.eval.clipsim import clip_preprocess
    from lavie_tpu.io.tokenizer import CLIPTokenizer

    tuner, frozen, mapper_params, text_cfg, vis_cfg = _build(cfg)
    tokenizer = CLIPTokenizer(
        max_length=text_cfg.max_position_embeddings, vocab_size=text_cfg.vocab_size
    )
    logger = create_logger(cfg.get("logging_dir", "logs"))
    metrics_log = MetricLogger(cfg.get("logging_dir", "logs"))

    tiny = cfg.get("model_scale", "full") == "tiny"
    size = (64, 64) if tiny else tuple(cfg.get("image_size", [320, 512]))
    ds = MSVDDataset(
        cfg["train_data_dir"],
        cfg.get("annotations_path"),
        num_frames=cfg.get("video_length", 16) if not tiny else 2,
        size=size,
    )
    dl = DataLoader(ds, batch_size=cfg.get("train_batch_size", 1), num_workers=2)

    state = tuner.init_state(jax.random.PRNGKey(1), mapper_params)
    out_dir = cfg.get("output_dir", "./checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    if cfg.get("resume_from_checkpoint") == "latest":
        state, resumed = tuner.load_latest_checkpoint(out_dir, state)
        if resumed:
            logger.info(f"resumed from step {int(state.step)}")

    step_fn = tuner.jitted_step()
    key = jax.random.PRNGKey(2)
    max_steps = cfg.get("max_train_steps") or 10
    epochs = cfg.get("num_train_epochs", 1)
    # default 0: the fork's fine-tuning loop never blanks captions (CFG
    # caption dropout is the upstream base-training recipe); opt in via YAML
    drop_p = cfg.get("caption_dropout", 0.0)
    drop_rng = np.random.RandomState(cfg.get("seed") or 0)
    done = False
    for epoch in range(epochs):
        if done:
            break
        for batch_np in dl:
            key, sub = jax.random.split(key)
            # CFG caption blanking (reference token_drop, clip.py:70-81)
            captions = [
                "" if drop_rng.rand() < drop_p else c for c in batch_np["caption"]
            ]
            batch = {
                "video": jnp.asarray(batch_np["video"]),
                "token_ids": jnp.asarray(tokenizer(captions)),
                "cond_image": jnp.asarray(
                    np.stack([
                        clip_preprocess(((f + 1) * 127.5).astype(np.uint8)[None],
                                        vis_cfg.image_size)[0]
                        for f in batch_np["cond_frame"]
                    ])
                ),
            }
            state, m = step_fn(state, frozen, batch, sub)
            step = int(state.step)
            logger.info(
                f"step {step}: loss={float(m['loss']):.4f} "
                f"mse={float(m['mse']):.4f} align={float(m['align']):.4f}"
            )
            metrics_log.log(step, m)
            if step % cfg.get("checkpointing_steps", 504) == 0:
                tuner.save_checkpoint(out_dir, state)
            if step >= max_steps:
                done = True
                break
    tuner.save_checkpoint(out_dir, state)
    logger.info("training done")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--method", type=int, default=1,
                        help="1=train 2=infer 3=CLIPSIM 4=FVD")
    args = parser.parse_args(argv)
    cfg = load_yaml_config(args.config)

    if args.method == 1:
        train(cfg)
    elif args.method == 2:
        from lavie_tpu.cli.sample import build_pipeline
        from lavie_tpu.io.video import write_video

        pipe = build_pipeline(cfg)
        out_dir = cfg.get("output_folder", "./res/finetune/")
        os.makedirs(out_dir, exist_ok=True)
        for prompt in cfg.get("text_prompt", ["a video"]):
            out = pipe(prompt, seed=cfg.get("seed"))
            print(write_video(os.path.join(out_dir, prompt.replace(" ", "_") + ".mp4"),
                              out.video[0], fps=8))
    elif args.method == 3:
        from lavie_tpu.data import VideoFolderDataset
        from lavie_tpu.eval import CLIPSimilarityScorer

        ds = VideoFolderDataset(cfg["eval_video_dir"], num_frames=8, size=(64, 64))
        scorer = CLIPSimilarityScorer()
        scores = []
        for i in range(len(ds)):
            s = ds[i]
            if s is None:
                continue
            video = ((s["video"] + 1) * 127.5).astype(np.uint8)
            scores.append(scorer.score(video, s["caption"]))
        print(f"CLIPSIM over {len(scores)} videos: {np.mean(scores):.4f}")
    elif args.method == 4:
        from lavie_tpu.data import VideoFolderDataset
        from lavie_tpu.eval import compute_fvd
        from lavie_tpu.eval.fvd import FVDFeatureExtractor

        real_ds = VideoFolderDataset(cfg["real_video_dir"], num_frames=8, size=(64, 64))
        fake_ds = VideoFolderDataset(cfg["eval_video_dir"], num_frames=8, size=(64, 64))
        to_uint8 = lambda ds: np.stack(
            [((ds[i]["video"] + 1) * 127.5).astype(np.uint8) for i in range(len(ds))]
        )
        ext = FVDFeatureExtractor(num_frames=8, size=64)
        print(f"FVD: {compute_fvd(to_uint8(real_ds), to_uint8(fake_ds), ext):.2f}")
    else:
        raise ValueError(f"unknown method {args.method}")


if __name__ == "__main__":
    main()
