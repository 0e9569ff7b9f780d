"""Device mesh + sharding layout for data/tensor-parallel training and serving.

TPU-native replacement for the reference's NCCL stack (HF Accelerate DDP for
gradients, raw torch.distributed inside the VQ codebook — reference:
main.py:429-434, vector_quantize.py:135-171).  The recipe is the standard JAX
one: pick a mesh, annotate shardings, let XLA's SPMD partitioner insert the
collectives over ICI/DCN.

Axes:
  data  — batch rows sharded across chips; gradient all-reduce is implicit in
          the jit-compiled train step (replaces Accelerate DDP).
  model — optional tensor parallelism over attention heads / MLP hidden dim
          (the reference has no TP; this is a capability upgrade, off by
          default with mesh shape (n_devices, 1)).

Multi-host: call `jax.distributed.initialize()` per host before building the
mesh; `make_mesh` then spans all processes' devices.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over all visible devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _ambient_mesh_has(axis: str) -> bool:
    m = jax.sharding.get_abstract_mesh()
    if m is None or axis not in getattr(m, "shape", {}):
        return False
    # inside shard_map (e.g. a pipeline stage, parallel/pipeline.py) the
    # axis is Manual and constraints are illegal AND meaningless — the model
    # axis is already consumed by the stages; constrain only Auto axes
    types = dict(zip(m.axis_names, m.axis_types))
    return types[axis] == jax.sharding.AxisType.Auto


def sp_scatter(x):
    """Sequence-parallel residual-stream constraint: (rows, tokens, d) with
    the TOKEN axis sharded over the model axis (Megatron-SP). Active only
    under a `jax.set_mesh(mesh)` context whose mesh has the model axis
    (sharding constraints are placement hints — with no mesh the identity is
    the same program, so eval/export paths need no special-casing); XLA SPMD
    lowers the scatter/gather pair around each TP block to
    reduce-scatter + all-gather."""
    if not _ambient_mesh_has(MODEL_AXIS):
        return x
    return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, MODEL_AXIS, None))


def sp_gather(x):
    """Gather the token axis back to full length for attention / TP matmuls
    (the all-gather half of the SP collective pair)."""
    if not _ambient_mesh_has(MODEL_AXIS):
        return x
    return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, None, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (packed-row) axis of every DCTPatches leaf over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a DCTPatches pytree with rows sharded across the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_batch_rows(batch: Any, multiple: int) -> Any:
    """Right-pad packed rows so the leading axis divides the data-axis size.

    Padding rows are fully masked (key_pad_mask True, empty attention), so
    they contribute nothing to masked losses/statistics.
    """
    import jax.numpy as jnp

    b = batch.patches.shape[0]
    pad_rows = (-b) % multiple
    if pad_rows == 0:
        return batch

    def pad(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        widths = [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    padded = jax.tree_util.tree_map(pad, batch)
    return padded.replace(key_pad_mask=padded.key_pad_mask.at[b:].set(True))


# Tensor-parallel layout for the CLIP transformer stacks: column-parallel
# q/k/v + fc1, row-parallel out_proj + fc2 (Megatron-style); XLA inserts the
# single all-reduce per block.  Everything else is replicated.
_TP_RULES = [
    (re.compile(r".*self_attn/(q_proj|k_proj|v_proj)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*self_attn/(q_proj|k_proj|v_proj)/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*self_attn/out_proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r".*/fc1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*/fc1/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*/fc2/kernel$"), P(MODEL_AXIS, None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(params: Any, tensor_parallel: bool = True) -> Any:
    """PartitionSpec pytree for the model params (TP rules or all-replicated)."""

    def spec_for(path, leaf):
        if tensor_parallel:
            ps = _path_str(path)
            for pat, spec in _TP_RULES:
                if pat.match(ps):
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_sharding(params: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    specs = param_spec(params, tensor_parallel)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    sh = param_sharding(params, mesh, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def zero1_opt_spec(opt_state: Any, mesh: Mesh, min_size: int = 2**13) -> Any:
    """ZeRO-1 PartitionSpec tree for optimizer state.

    Each sizeable leaf (Adam mu/nu and friends) gets sharded over the DATA
    axis on its first evenly-divisible dim; scalars/small leaves replicate.
    Handing this to jit as the TrainState.opt_state in/out sharding makes
    XLA's SPMD partitioner lower the optimizer update as
    reduce-scatter(grads) -> per-shard update -> all-gather(params) — the
    ZeRO-1 memory split (optimizer state / n_data per chip) without any
    manual collectives.  min_size gates tiny leaves where sharding overhead
    beats the memory win (set 0 in tests).
    """
    n = mesh.shape[DATA_AXIS]

    def spec_for(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        if not shape or int(np.prod(shape)) < max(min_size, 1):
            return P()
        for ax, dim in enumerate(shape):
            if dim >= n and dim % n == 0:
                return P(*([None] * ax + [DATA_AXIS]))
        return P()

    return jax.tree_util.tree_map(spec_for, opt_state)


def zero1_opt_sharding(opt_state: Any, mesh: Mesh, min_size: int = 2**13) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), zero1_opt_spec(opt_state, mesh, min_size)
    )


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (replaces torch.distributed/Accelerate init)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
