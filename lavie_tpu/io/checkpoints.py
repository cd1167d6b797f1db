"""Checkpoint loading/saving for pipelines.

Torch side: loads the reference's monolithic .pt checkpoints (preferring the
"ema" sub-dict like reference: base/download.py:10-18) and the SD-1.4
component folders, converting through io.convert.

Native side: orbax checkpoints of the whole params tree (replacing the
reference's torch.save round trips, SURVEY §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax

from lavie_tpu.io.convert import (
    convert_clip_text,
    convert_state_dict,
    load_torch_state_dict,
)


def load_pipeline_params(
    init_params: Dict[str, Any],
    unet_ckpt: Optional[str] = None,
    sd_path: Optional[str] = None,
    unet_config: Optional[Any] = None,
) -> Dict[str, Any]:
    """Fill a pipeline params tree {"unet","vae","text_encoder"} from torch
    checkpoints. Any missing piece keeps its fresh init.

    When `unet_config` is given and its temporal attention is rope-based, the
    temporal to_q/to_k columns are re-based from the reference's interleaved
    RoPE layout to the TPU half-split layout (convert.permute_rope_channels)."""
    params = dict(init_params)
    if unet_ckpt and os.path.exists(unet_ckpt):
        sd = load_torch_state_dict(unet_ckpt)
        params["unet"] = convert_state_dict(init_params["unet"], sd)
        if unet_config is not None and getattr(
            unet_config, "temporal_attention", None
        ) == "rope_relbias":
            from lavie_tpu.io.convert import permute_rope_channels

            params["unet"] = permute_rope_channels(
                params["unet"],
                heads=unet_config.num_attention_heads,
                rot_dim=unet_config.rope_dim,
            )
    if sd_path:
        vae_bin = _find_weights(os.path.join(sd_path, "vae"))
        if vae_bin:
            params["vae"] = convert_state_dict(
                init_params["vae"], load_torch_state_dict(vae_bin)
            )
        text_bin = _find_weights(os.path.join(sd_path, "text_encoder"))
        if text_bin:
            params["text_encoder"] = convert_clip_text(
                init_params["text_encoder"], load_torch_state_dict(text_bin)
            )
    return params


def _find_weights(folder: str) -> Optional[str]:
    for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin", "model.pt"):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            return p
    return None


# ---------------------------------------------------------------------------
# orbax native checkpoints
# ---------------------------------------------------------------------------


def save_orbax(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_orbax(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), target=like)
        return ckptr.restore(os.path.abspath(path))
