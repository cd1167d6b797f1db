"""Device mesh and sharding helpers.

The reference's only distributed code is NCCL DDP initialization for training
(reference: interpolation/utils.py:210-247). On TPU none of that ports: we
declare a `jax.sharding.Mesh` and annotate shardings; XLA inserts the
collectives over ICI.

Axes:
  dp — data parallel (batch)
  sp — sequence/frame parallel (the video analog of context parallelism;
       spatial convs, spatial attention and VAE are embarrassingly parallel
       over frames, only the f×f temporal attention and (5,1,1) temporal convs
       need cross-frame communication, which XLA lowers to all-gathers)
  tp — tensor parallel (attention heads / hidden features of the wide blocks)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    sp: Optional[int] = None,
    tp: int = 1,
) -> Mesh:
    """Build a (dp, sp, tp) mesh over the given devices.

    With defaults, all devices go to the frame axis (sp) — the natural
    inference sharding for a single video.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None and sp is None:
        dp, sp = 1, n // tp
    elif dp is None:
        dp = n // (sp * tp)
    elif sp is None:
        sp = n // (dp * tp)
    assert dp * sp * tp == n, f"mesh {dp}x{sp}x{tp} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(dev_array, axis_names=("dp", "sp", "tp"))


def shard_batch_frames(mesh: Mesh) -> NamedSharding:
    """Sharding for video tensors (B, F, H, W, C): batch over dp, frames over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Sharding for per-sample tensors (B, ...): batch over dp."""
    return NamedSharding(mesh, P("dp"))
