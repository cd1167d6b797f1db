"""Functional LoRA for the UNet attention projections.

The reference wraps the torch UNet with PEFT (r=16 on to_q/to_k/to_v/to_out.0,
reference: base/pipelines/fine_tuning.py:296-301). Here LoRA is a separate
params pytree merged into the frozen base weights inside the jitted step —
pure-functional, so the same UNet module serves both inference and LoRA
training, and only the adapter tree receives gradients.

Conventions match PEFT: A ~ N(0, 1/r) (kaiming-ish), B = 0, effective weight
W + (alpha/r)·A·B.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out_0")


def _iter_paths(params, prefix=()):
    for k, v in params.items():
        if isinstance(v, dict):
            yield from _iter_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def lora_target_paths(
    params: Dict[str, Any], targets: Sequence[str] = DEFAULT_TARGETS
) -> list:
    """Kernel paths of all targeted Dense layers."""
    out = []
    for path, leaf in _iter_paths(params):
        if len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets and leaf.ndim == 2:
            out.append(path)
    return out


def lora_init(
    rng: jax.Array,
    params: Dict[str, Any],
    rank: int = 16,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Dict[str, Any]:
    """Build the adapter tree: {module_path: {"a": (in, r), "b": (r, out)}}."""
    lora: Dict[str, Any] = {}
    paths = lora_target_paths(params, targets)
    keys = jax.random.split(rng, max(len(paths), 1))
    for key, path in zip(keys, paths):
        kernel = _get(params, path)
        d_in, d_out = kernel.shape
        a = jax.random.normal(key, (d_in, rank), dtype=jnp.float32) / np.sqrt(rank)
        b = jnp.zeros((rank, d_out), dtype=jnp.float32)
        _set(lora, path[:-1] + ("lora",), {"a": a, "b": b})
    return lora


def lora_merge(
    params: Dict[str, Any], lora: Dict[str, Any], alpha: float = 16.0, rank: int = 16
) -> Dict[str, Any]:
    """Return params with kernel ← kernel + (alpha/r)·A·B for every adapter.
    Runs inside jit; gradients flow to A/B only if only `lora` is
    differentiated."""
    scale = alpha / rank

    def merge_into(node, lnode):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                sub_l = lnode.get(k, {}) if isinstance(lnode, dict) else {}
                out[k] = merge_into(v, sub_l)
            else:
                out[k] = v
        if isinstance(lnode, dict) and "lora" in lnode:
            ab = lnode["lora"]
            out["kernel"] = out["kernel"] + scale * (
                ab["a"].astype(out["kernel"].dtype) @ ab["b"].astype(out["kernel"].dtype)
            )
        return out

    return merge_into(params, lora)


def lora_param_count(lora: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
