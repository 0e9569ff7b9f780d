"""In-program 1F1B pipeline schedule: combined forward/backward scan with
per-tick vjp.

GPipe (`parallel.pipeline.pipeline_stack_apply` + `jax.grad`) runs ALL M
microbatch forwards, then lets autodiff run all M backwards — every
microbatch's saved activations are live across the whole backward, so
activation memory grows O(M).  The classic fix (PipeDream-2BW / Megatron's
"1F1B") interleaves: a microbatch's backward starts as soon as its forward
leaves the last stage, so at most O(S) microbatches are ever in flight and
activation memory is bounded by the stage count, independent of M.

That schedule cannot be expressed through `jax.grad` of a forward scan (the
loss for microbatch m must SEED m's backward while m+1 is still forwarding),
so this module hand-schedules both passes in ONE `lax.scan` inside a
`jax.shard_map` region (round-4 analysis: docs/parallelism.md "Schedule"):

  * tick t, stage s: FORWARD of microbatch  mf = t - s            (if valid)
                     BACKWARD of microbatch mb = t - (2S-2) + s   (if valid)
    — at the last stage mf == mb: forward, loss, and backward-seed happen in
    the same tick, which is exactly the 1F1B admission rule.  Steady-state
    ticks run one F and one B on every stage (no per-tick idling); total
    ticks T = M + 2S - 2, so the bubble is the same (S-1)-proportional ramp
    GPipe pays — the win is MEMORY, not bubble (1F1B's textbook property).
  * residuals are input-only: each stage keeps a (2S,)-slot circular buffer
    of stage INPUTS (+ attention metadata) and recomputes its block inside
    `jax.vjp` at backward ticks (remat-style).  In-flight residuals at stage
    s number 2(S-1-s) <= 2S-2 < 2S, so the buffer never collides and memory
    is O(S * microbatch) regardless of M.
  * the loss lives INSIDE the pipeline: `loss_fn(y, ids, pad)` is evaluated
    (branchlessly, on every stage — garbage off the last stage) as part of
    the per-stage composite, and one vjp of the composite serves both cases:
    cotangent (g_y, g_l) with g_l = 1/(M * n_data) on the last stage and
    g_y = the downstream grad elsewhere.
  * activations hop downstream and gradients hop upstream with
    `lax.ppermute` (point-to-point ICI, both directions of the ring).
  * param grads accumulate locally per stage and leave the shard_map still
    sharded P(model-axis) on the stacked (L,) layout — the same layout the
    GPipe path's master params use at rest, so an optimizer step over them
    needs no gather.

This is the analyzed-but-unbuilt round-4 item built as a LIBRARY PRIMITIVE
(equivalence-tested vs the sequential stack fwd+bwd; memory measured in
docs/parallelism.md).  The train step's default remains GPipe + params at
rest: at tokenizer scale the r4 memory study showed activations are not the
binding constraint — this primitive is the building block for the regime
where they are (long-sequence / large-M training).

No reference counterpart (the reference is DDP-only, main.py:429-434).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .pipeline import PipelineSpec


def pipeline_1f1b_loss_and_grad(
    layer_apply,
    loss_fn,
    stacked_params,
    x: jnp.ndarray,
    image_ids: jnp.ndarray,
    key_pad_mask: jnp.ndarray,
    spec: PipelineSpec,
):
    """1F1B value-and-grad of `mean_m loss_fn(stack(x_m))` over microbatches.

    layer_apply(layer_params, x, ids, pad) -> x applies ONE layer (stacked
    on a leading (L,) axis, L % n_stages == 0); loss_fn(y, ids, pad) -> scalar
    is the per-microbatch objective evaluated on the LAST stage's output.

    Returns (loss, stacked_param_grads, dx):
      loss  — scalar, mean over all microbatches of all data shards;
      stacked_param_grads — same (L,)-stacked structure as stacked_params,
        d loss / d params, left sharded over the model axis;
      dx    — (b, s, d) grad of loss wrt x (for upstream embeddings).
    """
    mesh = spec.mesh
    S = spec.n_stages
    M = spec.n_microbatches
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"{L} layers not divisible into {S} pipeline stages")
    n_data = mesh.shape.get(spec.data_axis, 1)
    if x.shape[0] % (n_data * M) != 0:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by data shards x microbatches "
            f"({n_data} x {M})"
        )
    nslots = 2 * S  # > max in-flight residuals (2S-2)

    def block(local_params, xm, ids, pad):
        def body(carry, p):
            return layer_apply(p, carry, ids, pad), None

        out, _ = jax.lax.scan(body, xm, local_params)
        return out

    def per_device(local_params, x, ids_full, pads_full):
        def to_micro(a):
            return a.reshape(M, a.shape[0] // M, *a.shape[1:])

        xs, ids, pads = to_micro(x), to_micro(ids_full), to_micro(pads_full)
        stage = jax.lax.axis_index(spec.axis)
        last = S - 1
        T = M + 2 * S - 2
        fwd_perm = [(i, (i + 1) % S) for i in range(S)]
        bwd_perm = [((i + 1) % S, i) for i in range(S)]
        seed = 1.0 / (M * n_data)

        def composite(p, xm, idm, padm):
            y = block(p, xm, idm, padm)
            return y, loss_fn(y, idm, padm)

        zero_micro = jnp.zeros_like(xs[0])

        def tick(carry, t):
            mf = t - stage
            mb = t - (2 * S - 2) + stage
            valid_f = (mf >= 0) & (mf < M)
            valid_b = (mb >= 0) & (mb < M)
            fslot = jnp.clip(mf, 0, M - 1) % nslots
            bslot = jnp.clip(mb, 0, M - 1) % nslots

            take = lambda a, i: jax.lax.dynamic_index_in_dim(
                a, jnp.clip(i, 0, M - 1), 0, keepdims=False
            )
            fwd_x, fwd_ids, fwd_pads = carry["fwd_buf"]
            # stage 0 injects microbatch mf; downstream stages consume what
            # arrived on the ring (activation + its attention metadata)
            x_in = jnp.where(stage == 0, take(xs, mf), fwd_x)
            id_in = jnp.where(stage == 0, take(ids, mf), fwd_ids)
            pad_in = jnp.where(stage == 0, take(pads, mf), fwd_pads)

            # save residual (input-only; block recomputed in the vjp)
            take_slot = lambda buf, i: jax.lax.dynamic_index_in_dim(
                buf, i, 0, keepdims=False
            )
            resid_x = jax.lax.dynamic_update_index_in_dim(
                carry["resid_x"],
                jnp.where(valid_f, x_in, take_slot(carry["resid_x"], fslot)),
                fslot, 0,
            )
            resid_ids = jax.lax.dynamic_update_index_in_dim(
                carry["resid_ids"],
                jnp.where(valid_f, id_in, take_slot(carry["resid_ids"], fslot)),
                fslot, 0,
            )
            resid_pads = jax.lax.dynamic_update_index_in_dim(
                carry["resid_pads"],
                jnp.where(valid_f, pad_in, take_slot(carry["resid_pads"], fslot)),
                fslot, 0,
            )

            y = block(local_params, x_in, id_in, pad_in)

            # ---- backward half: one vjp of the composite serves every stage
            bx = take_slot(resid_x, bslot)
            bids = take_slot(resid_ids, bslot)
            bpads = take_slot(resid_pads, bslot)
            (y_b, loss_b), vjp_fn = jax.vjp(
                lambda p, xm: composite(p, xm, bids, bpads), local_params, bx
            )
            g_y = jnp.where(stage == last, jnp.zeros_like(y_b), carry["grad_buf_g"])
            g_l = jnp.where(stage == last, jnp.float32(seed), 0.0)
            dparams, dx = vjp_fn((g_y, g_l))
            pgrads = jax.tree_util.tree_map(
                lambda acc, d: acc + jnp.where(valid_b, d, 0.0).astype(acc.dtype),
                carry["pgrads"], dparams,
            )
            loss = carry["loss"] + jnp.where(
                valid_b & (stage == last), loss_b * seed, 0.0
            )
            # stage 0's dx is the pipeline-input grad for microbatch mb
            dxs = jax.lax.dynamic_update_index_in_dim(
                carry["dxs"],
                jnp.where(
                    valid_b & (stage == 0), dx,
                    take(carry["dxs"], mb),
                ),
                jnp.clip(mb, 0, M - 1), 0,
            )

            # ---- ring transport: activations downstream, grads upstream
            ny, nids, npads = jax.lax.ppermute(
                (y, id_in, pad_in), spec.axis, fwd_perm
            )
            ng = jax.lax.ppermute(dx, spec.axis, bwd_perm)
            new_carry = dict(
                fwd_buf=(ny, nids, npads),
                grad_buf_g=ng,
                resid_x=resid_x,
                resid_ids=resid_ids,
                resid_pads=resid_pads,
                pgrads=pgrads,
                loss=loss,
                dxs=dxs,
            )
            return new_carry, None

        carry0 = dict(
            fwd_buf=(zero_micro, ids[0] * 0, pads[0] & False),
            grad_buf_g=zero_micro,
            resid_x=jnp.zeros((nslots,) + xs[0].shape, xs.dtype),
            resid_ids=jnp.zeros((nslots,) + ids[0].shape, ids.dtype),
            resid_pads=jnp.zeros((nslots,) + pads[0].shape, pads.dtype),
            pgrads=jax.tree_util.tree_map(
                lambda t: jnp.zeros(t.shape, jnp.float32), local_params
            ),
            loss=jnp.float32(0.0),
            dxs=jnp.zeros_like(xs),
        )
        final, _ = jax.lax.scan(tick, carry0, jnp.arange(T))

        # loss lives on the last stage, dxs on stage 0: share over the axis
        loss = jax.lax.psum(final["loss"], spec.axis)
        dxs = jax.lax.psum(
            jnp.where(stage == 0, final["dxs"], jnp.zeros_like(final["dxs"])),
            spec.axis,
        )
        # sum losses/grads over data shards (mean seed already includes 1/n)
        if spec.data_axis in mesh.shape:
            loss = jax.lax.psum(loss, spec.data_axis)
            pgrads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, spec.data_axis), final["pgrads"]
            )
        else:
            pgrads = final["pgrads"]
        return loss, pgrads, dxs.reshape(x.shape)

    dp = P(spec.data_axis) if spec.data_axis in mesh.shape else P()
    loss, pgrads, dx = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(spec.axis), dp, dp, dp),
        out_specs=(P(), P(spec.axis), dp),
        check_vma=False,
    )(stacked_params, x, image_ids, key_pad_mask)
    return loss, pgrads, dx
