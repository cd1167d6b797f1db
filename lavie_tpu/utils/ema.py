"""EMA parameter tracking (the reference keeps EMA weights for its shipped
checkpoints and training; reference: interpolation/utils.py:184-194,
base/download.py prefers the "ema" sub-dict)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema_params: Any, params: Any, decay: float = 0.9999) -> Any:
    """ema ← decay·ema + (1−decay)·params — jit/scan friendly."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )
