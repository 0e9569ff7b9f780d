"""GPipe pipeline parallelism over the transformer layer stacks.

The reference scales with data parallelism only (HF Accelerate DDP,
reference: main.py:429-434); tensor parallelism (parallel/mesh.py) and this
module are capability upgrades for multi-chip TPU pods.  Pipeline parallelism
is the standard third axis: layers are partitioned into S contiguous stages
over the mesh's `model` axis and microbatches stream through the stages,
activations hopping stage->stage over ICI with `lax.ppermute` (the
scaling-book pipelining recipe).  Useful when the model's layers do not fit
(or do not run efficiently) replicated per chip and TP's per-layer
all-reduces would cross slow links — pp's point-to-point hops are the
cheapest collective on a TPU torus.

Design notes (TPU/XLA-first):
  * The schedule is a single `lax.scan` over M + S - 1 ticks inside one
    `jax.shard_map` region — static trip count, no data-dependent control
    flow, one compiled program.  Each tick every stage runs its layer block
    on the microbatch it currently holds, then the activations rotate one
    stage forward.  Bubble ticks compute on garbage that is simply never
    collected (branchless; a `lax.cond` per tick would serialize worse on
    TPU than the wasted compute of S-1 warmup ticks).
  * Layer parameters ride stacked on a leading (L,) axis sharded over the
    `model` axis, so each stage holds only its own L/S layers inside the
    shard_map body.  The stack is built at trace time from the flax
    per-layer params (`layers_{i}`, models/transformer.py) — checkpoints,
    init, and every non-pp code path keep the plain per-layer layout.  XLA
    SPMD partitions the stacking concat so each device materializes only
    its stage's slice of the STACKED view.  The master per-layer params AND
    their Adam moments live model-axis-sharded at rest
    (train.loop.model_state_sharding, pinned on jit in/out): pp buys
    parameter/optimizer memory (matched matrices split S ways), not just
    activation locality — the big-matrix layout matches the Megatron TP
    rules, so the per-step gather into the stacked view is the only
    param-sized collective.
  * Attention metadata (packed image ids + pad mask, AttentionContext)
    rotates with the activations — each stage always sees the metadata of
    the microbatch it is processing.
  * Composes with data parallelism: the batch axis stays sharded over
    `data` inside the same shard_map (each data shard runs its own
    pipeline), and with remat (`jax.checkpoint` around each stage block).

Gradient correctness: `ppermute`/`scan`/`dynamic_update_slice` are all
differentiable, so `jax.grad` through the schedule IS the pipelined backward
pass (activations of the forward scan are saved per tick, i.e. GPipe's
"all microbatches' activations live until the backward" memory profile; use
remat=True to cut that to O(1) per layer block).  Equivalence with the
sequential stack is tested fwd+bwd in tests/test_parallel.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


@dataclasses.dataclass(frozen=True)
class PipelineSpec:
    """Static pipeline configuration (hashable: usable as a flax module attr).

    mesh must contain `axis` (the stage axis); layers are split into
    mesh.shape[axis] contiguous stages.  n_microbatches divides the
    per-data-shard batch (packed rows for the tokenizer stacks).
    """

    mesh: Mesh
    n_microbatches: int = 4
    axis: str = MODEL_AXIS
    data_axis: str = DATA_AXIS

    @property
    def n_stages(self) -> int:
        return self.mesh.shape[self.axis]


def make_pipelined_module(module: Any, mesh: Mesh, n_microbatches: int) -> Any:
    """A DCTAutoencoderModule clone of `module` whose transformer stacks run
    as a GPipe pipeline over `mesh`'s model axis (same params/checkpoints;
    one shared constructor so train(), the dryrun, and tests agree)."""
    from ..models.autoencoder import DCTAutoencoderModule

    return DCTAutoencoderModule(
        module.config,
        dtype=module.dtype,
        pipeline=PipelineSpec(mesh=mesh, n_microbatches=n_microbatches),
    )


def stack_layer_params(params: dict, num_layers: int) -> Any:
    """Stack flax per-layer param subtrees `layers_0..layers_{L-1}` on a new
    leading (L,) axis (identical layer structure required)."""
    layers = [params[f"layers_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_stack_apply(
    layer_apply: Callable[[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    image_ids: jnp.ndarray,
    key_pad_mask: jnp.ndarray,
    spec: PipelineSpec,
    remat: bool = False,
) -> jnp.ndarray:
    """Run a homogeneous layer stack as a GPipe pipeline.

    layer_apply(layer_params, x, image_ids, key_pad_mask) -> x applies ONE
    layer; stacked_params has leading axis L (L % n_stages == 0); x is the
    full (b, s, d) activation (b % n_microbatches == 0 per data shard).
    Returns the same (b, s, d) the sequential loop would.
    """
    mesh = spec.mesh
    S = spec.n_stages
    M = spec.n_microbatches
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"{L} layers not divisible into {S} pipeline stages")
    n_data = mesh.shape.get(spec.data_axis, 1)
    b = x.shape[0]
    if b % (n_data * M) != 0:
        raise ValueError(
            f"batch {b} not divisible by data shards x microbatches "
            f"({n_data} x {M})"
        )

    def block(local_params, xm, ids, pad):
        """One stage: this device's L/S layers, sequentially (lax.scan keeps
        the program size O(1) in depth)."""
        one = layer_apply
        if remat:
            one = jax.checkpoint(one)

        def body(carry, p):
            return one(p, carry, ids, pad), None

        out, _ = jax.lax.scan(body, xm, local_params)
        return out

    def per_device(local_params, x, ids_full, pads_full):
        # microbatch split happens HERE, per data shard, so the row
        # partition at the shard_map boundary is the train step's own
        # P(data) — no boundary reshard collective
        def to_micro(a):
            return a.reshape(M, a.shape[0] // M, *a.shape[1:])

        xs, ids, pads = to_micro(x), to_micro(ids_full), to_micro(pads_full)
        stage = jax.lax.axis_index(spec.axis)
        T = M + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]
        buf = (jnp.zeros_like(xs[0]), ids[0], pads[0])
        outs = jnp.zeros_like(xs)

        def tick(carry, t):
            (bx, bi, bp), outs = carry
            # stage 0 injects microbatch t (clamped reads past M-1 feed
            # bubble ticks whose results are never collected)
            mb = jnp.minimum(t, M - 1)
            take = lambda a: jax.lax.dynamic_index_in_dim(a, mb, 0, keepdims=False)
            first = stage == 0
            bx = jnp.where(first, take(xs), bx)
            bi = jnp.where(first, take(ids), bi)
            bp = jnp.where(first, take(pads), bp)
            y = block(local_params, bx, bi, bp)
            # last stage owns microbatch t-(S-1) this tick
            oidx = t - (S - 1)
            outs = jnp.where(
                (stage == S - 1) & (oidx >= 0),
                jax.lax.dynamic_update_index_in_dim(
                    outs, y, jnp.maximum(oidx, 0), 0
                ),
                outs,
            )
            # rotate activations + metadata one stage forward (ICI hop)
            y, bi, bp = jax.lax.ppermute((y, bi, bp), spec.axis, perm)
            return ((y, bi, bp), outs), None

        (_, outs), _ = jax.lax.scan(tick, (buf, outs), jnp.arange(T))
        # collected outputs live on the last stage; replicate over the axis
        outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, spec.axis)
        return outs.reshape(x.shape)

    dp = P(spec.data_axis) if spec.data_axis in mesh.shape else P()
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(spec.axis), dp, dp, dp),
        out_specs=dp,
        check_vma=False,
    )(stacked_params, x, image_ids, key_pad_mask)
