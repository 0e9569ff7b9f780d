"""Two-tier checkpointing (reference: main.py:274-276, 436-438, 458-460).

Mirrors the reference's split:
  * model weights + config       -> DCTAutoencoder.save_pretrained
    (HF save_pretrained counterpart, portable across training runs);
  * full training state          -> orbax (params + optimizer moments +
    patchnorm stats + step), the Accelerate save_state/load_state
    counterpart, for exact resume.

Orbax handles sharded arrays natively: on a multi-host mesh each process
writes its shard, restore re-shards to the current topology.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import orbax.checkpoint as ocp

from ..models.patchnorm import PatchNormState
from .loop import TrainState


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(os.path.join(path, "train_state"))


def save_train_state(path: str, state: TrainState, patchnorm: PatchNormState) -> str:
    """Save the full training state for exact resume."""
    target = _ckpt_dir(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "vq_stats": state.vq_stats,
        "patchnorm": {"n": patchnorm.n, "median": patchnorm.median, "b": patchnorm.b},
    }
    ckptr.save(target, payload, force=True)
    ckptr.wait_until_finished()
    return target


def load_train_state(
    path: str, state_like: TrainState, patchnorm_like: PatchNormState
) -> Tuple[TrainState, PatchNormState]:
    """Restore training state; `*_like` provide the pytree structure/shapes
    (and shardings, when their arrays are device-put on a mesh)."""
    target = _ckpt_dir(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state_like.params,
        "opt_state": state_like.opt_state,
        "step": state_like.step,
        "vq_stats": state_like.vq_stats,
        "patchnorm": {
            "n": patchnorm_like.n,
            "median": patchnorm_like.median,
            "b": patchnorm_like.b,
        },
    }
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    restored = ckptr.restore(target, abstract)
    state = TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        vq_stats=restored.get("vq_stats", {}),
    )
    pn = PatchNormState(
        n=restored["patchnorm"]["n"],
        median=restored["patchnorm"]["median"],
        b=restored["patchnorm"]["b"],
    )
    return state, pn


def has_train_state(path: str) -> bool:
    return os.path.isdir(_ckpt_dir(path))
