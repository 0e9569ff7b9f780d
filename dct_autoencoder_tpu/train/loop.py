"""Training loop: optimizer, sharded train step, calibration, checkpoints.

TPU-native port of the reference trainer (reference: main.py:115-280):
  * optax AdamW(0.9, 0.99, wd 0.1) + cosine schedule with 200 warmup steps +
    global-norm clip 5.0 (replaces PagedAdamW8bit + HF scheduler +
    accelerator.clip_grad_norm_, main.py:420-427, 242-244); the 8-BIT moment
    state itself is available TPU-native via opt_8bit=True
    (train/opt8bit.py — CUDA paging is the only part with no TPU meaning);
  * the whole train step (fwd + bwd + update) is ONE jit-compiled program over
    a (data, model) mesh — gradient all-reduce is XLA-inserted, replacing
    Accelerate DDP (main.py:429-434);
  * norm-calibration phase with beta forced to 0 / full sequences
    (main.py:388-404);
  * grad accumulation, NaN abort, metric logging hooks.
"""
from __future__ import annotations

import contextlib
import dataclasses
import math
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.autoencoder import DCTAutoencoder, DCTAutoencoderModule
from ..models.patchnorm import PatchNormState, apply_patchnorm, calibrate_patchnorm_batch
from ..parallel.mesh import (
    Mesh,
    batch_sharding,
    make_mesh,
    pad_batch_rows,
    replicated,
)
from ..patches.container import DCTPatches
from ..patches.extractor import DCTAutoencoderFeatureExtractor
from .losses import step_autoencoder, weighted_total


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # non-param model state: VQ EMA affine/usage stats ({} for LFQ) — the
    # flax 'vq_stats' variable collection threaded through the train step
    vq_stats: Any = dataclasses.field(default_factory=dict)

    @staticmethod
    def create(
        params: Any, tx: optax.GradientTransformation, vq_stats: Any = None
    ) -> "TrainState":
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            vq_stats=vq_stats or {},
        )


class RssLimitExceeded(RuntimeError):
    """Raised by train() when host RSS crosses rss_limit_gb AFTER the state
    was checkpointed — the caller can restart the process and resume.

    Exists because of a measured host-memory leak in this environment's
    experimental remote-TPU client: every host->device transfer leaks its
    full payload (probe: 9.18 MB leaked per 9.63 MB device_put; dispatches
    and device->host pulls leak nothing), so a training loop leaks
    ~batch-size bytes per step (~37 MB/step at small-448) and a multi-hour
    run is eventually OOM-killed mid-interval. The watchdog turns that kill
    into a clean checkpoint + resumable exit; the CLI re-execs itself and
    continues in a fresh process (same out_dir, exact-resume checkpoints)."""

    def __init__(self, step: int, rss_gb: float, out_dir: str):
        super().__init__(
            f"host RSS {rss_gb:.1f} GB exceeded the limit at step {step}; "
            f"train state checkpointed to {out_dir} for restart"
        )
        self.step = step
        self.rss_gb = rss_gb
        self.out_dir = out_dir


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0 / 1024.0
    except OSError:
        pass
    return 0.0


def _start_stall_watchdog(stall_timeout_s: float, progress: dict, on_stall, log) -> None:
    """Daemon thread that fires on_stall when no step completes in time.

    Arms only after the FIRST completed step (progress["t"] is None until
    then), so multi-minute first compiles never trip it.  progress["done"]
    retires it.  on_stall must be process-level (execv / os._exit) — it runs
    off the main thread, which may be blocked irrecoverably inside a device
    client (the hang class this exists for)."""
    import threading

    def watch():
        interval = max(min(stall_timeout_s / 4.0, 30.0), 0.05)
        while True:
            time.sleep(interval)
            if progress.get("done"):
                return
            t = progress.get("t")
            if t is None:
                continue
            if time.monotonic() - t > stall_timeout_s:
                log(
                    {
                        "error": f"STALL: no training step completed in "
                        f"{stall_timeout_s:.0f}s — watchdog firing "
                        "(resume from the last checkpoint)",
                    }
                )
                if on_stall is not None:
                    on_stall()
                else:
                    os._exit(73)
                return

    threading.Thread(target=watch, daemon=True, name="stall-watchdog").start()


def _auto_rss_limit_gb() -> float:
    """75% of MemTotal — headroom for the checkpoint write + page cache."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return 0.75 * int(line.split()[1]) / 1024.0 / 1024.0
    except OSError:
        pass
    return 0.0


def make_optimizer(
    learning_rate: float = 1e-4,
    max_iters: int = 10000,
    warmup_steps: int = 200,
    weight_decay: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.99,
    grad_clip: float = 5.0,
    opt_8bit: bool = False,
) -> optax.GradientTransformation:
    """AdamW + warmup-cosine + clip (reference main.py:420-427, 242-244).

    opt_8bit=True stores the Adam moments as blockwise int8 + per-block
    scales (train/opt8bit.py) — the TPU-native counterpart of the
    reference's DEFAULT bitsandbytes PagedAdamW8bit (main.py:420-425):
    ~2 bytes/param of optimizer state instead of 8. Composes with ZeRO-1."""
    warmup_steps = min(warmup_steps, max(max_iters - 1, 0))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(max_iters, warmup_steps + 1),
        end_value=0.0,
    )
    if opt_8bit:
        from .opt8bit import adamw8bit

        adam = adamw8bit(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    else:
        adam = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    return optax.chain(optax.clip_by_global_norm(grad_clip), adam)


def prepare_train_batch(
    batch: DCTPatches,
    pixel_loss_max_images: int = 0,
    clip_grid: Optional[Tuple[int, int]] = None,
):
    """Strip per-batch-varying static metadata before the jitted train step.

    patch_sizes / original_sizes / _data are static pytree aux — every distinct
    packing layout would otherwise recompile the whole train program (fatal on
    TPU where compiles are minutes).  The train step never reads them, and the
    model derives attention masks from image ids, so the (b, 1, s, s) attn_mask
    tensor is dropped too (it would otherwise ship to device every step).

    With pixel_loss_max_images > 0, the per-image patch grids are returned as a
    DEVICE ARRAY (max_images, 2) so the in-jit pixel loss can use them without
    becoming a compile-cache key.  Returns (stripped_batch, grid_sizes|None).
    """
    grid_sizes = None
    if pixel_loss_max_images:
        from .pixel_loss import make_grid_sizes

        assert clip_grid is not None
        grid_sizes = make_grid_sizes(batch, pixel_loss_max_images, clip_grid)
    batch = batch.replace(
        attn_mask=None, patch_sizes=(), original_sizes=(), _data=None
    )
    return batch, grid_sizes


def make_train_step(
    module: DCTAutoencoderModule,
    tx: optax.GradientTransformation,
    loss_weights: Optional[Dict[str, float]] = None,
    warmup_dict: Optional[Dict[str, int]] = None,
    accum_steps: int = 1,
    use_pixel_loss: bool = False,
    seed: int = 0,
    vq_kmeans_init: bool = True,
    vq_expire_threshold: float = 15.0,
    vq_expire_every: int = 50,
    dynamic_hparams: bool = False,
) -> Callable:
    """Build the pure train-step fn (state, patchnorm, batch) -> (state, metrics).

    dynamic_hparams=True: the step takes a 5th argument `hparams` — a dict of
    jnp scalars holding per-trial loss weights plus 'lr_scale' — so sweep
    trials with different hyperparameters reuse ONE compiled program (remote
    compiles are minutes each; train/sweep.py).  Build `tx` with peak
    learning_rate=1.0: the warmup-cosine schedule is linear in its peak and
    optax.adamw's final transform scales the whole update (incl. the decoupled
    weight-decay term) by lr, so multiplying the updates by lr_scale is EXACT,
    not an approximation (equivalence-tested in tests/test_train.py).

    The batch arrives already normalized is NOT assumed: normalization is done
    inside the step (frozen patchnorm), so one jit program covers
    normalize -> forward -> losses -> backward -> update.

    use_pixel_loss=True adds the differentiable RGB pixel loss (reference
    main.py decode_pixels=True path) and changes the step signature to
    (state, patchnorm, batch, grid_sizes) — pass the array built by
    prepare_train_batch.

    VQ mode (config.vq_type == 'vq') additionally, all inside the one jit:
      * threads the 'vq_stats' collection (EMA affine + code-usage stats,
        reference vector_quantize.py:340-409) through TrainState;
      * folds a per-step PRNG into the forward so gumbel code sampling at
        temperature 20 actually fires (reference vector_quantize.py:61-98);
      * k-means-initializes the codebook from the first batch's encoder
        projections (reference kmeans_init=True; applied after step 0's
        update — the reference initializes before quantizing that batch,
        a one-step difference);
      * every vq_expire_every steps replaces codes with EMA usage below
        vq_expire_threshold by random batch samples (reference
        threshold_ema_dead_code=15, vector_quantize.py:489-507).
    """
    is_vq = module.config.vq_type == "vq"
    base_key = jax.random.PRNGKey(seed)

    # losses that are means over VALID TOKENS; under grad accumulation each
    # micro-batch re-weights them by its token share so the uniform micro
    # average reproduces the whole-batch mean (entropy_loss is excluded: it
    # is nonlinear in the batch split, documented in the accum tests)
    _TOKEN_MEAN_LOSSES = ("rec_loss", "rec_loss_unnormalized", "commit_loss")

    def loss_fn(
        params, vq_stats, patchnorm, batch, step, rng, grid_sizes=None,
        pixel_rows=None, pixel_weight=None, token_weight=None, hparams=None,
    ):
        normalized = batch.replace(patches=apply_patchnorm(patchnorm, batch))
        losses = step_autoencoder(
            module,
            params,
            patchnorm,
            batch,
            normalized,
            training=True,
            pixel_grid_sizes=grid_sizes,
            pixel_rows=pixel_rows,
            rng=rng,
            vq_stats=vq_stats if is_vq else None,
        )
        if pixel_weight is not None and "pixel_loss" in losses:
            # micro-batch mode: the pixel loss is a per-IMAGE mean but grads
            # are averaged uniformly over micro-batches, so a micro owning
            # n_i of N images re-weights by n_i*K/N — accum=K then equals
            # accum=1 even when packing spreads images unevenly across rows
            losses["pixel_loss"] = losses["pixel_loss"] * pixel_weight
        if token_weight is not None:
            # same re-weighting for the per-token means (share of valid tokens)
            for k in _TOKEN_MEAN_LOSSES:
                if k in losses:
                    losses[k] = losses[k] * token_weight
        new_vq_stats = losses.pop("vq_stats", None)
        vq_z = losses.pop("vq_z", None)
        lw = loss_weights
        if hparams is not None:
            # per-trial weights as traced scalars (shared-program sweep)
            lw = dict(loss_weights or {})
            lw.update({k: v for k, v in hparams.items() if k != "lr_scale"})
        total = weighted_total(losses, lw, warmup_dict, step.astype(jnp.float32))
        metrics = {k: v for k, v in losses.items() if k not in ("codes", "rec_patches")}
        metrics["loss"] = total
        return total, (metrics, new_vq_stats, vq_z)

    def train_step(
        state: TrainState,
        patchnorm: PatchNormState,
        batch: DCTPatches,
        grid_sizes: Optional[jnp.ndarray] = None,
        hparams: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        rng = jax.random.fold_in(base_key, state.step) if is_vq else None
        if accum_steps == 1:
            (_, (metrics, new_vq_stats, vq_z)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.vq_stats, patchnorm, batch, state.step, rng,
              grid_sizes, None, None, None, hparams)
            surgery_mask = ~batch.key_pad_mask
        else:
            # micro-batch over the leading (row) axis with a scan: grads are
            # averaged, with per-token/per-image loss means re-weighted by
            # each micro's token/image share so accum=K reproduces accum=1
            # even under uneven packing; VQ EMA stats thread micro->micro
            # (the reference's accumulate wraps the whole step, so its EMA
            # buffers also update on every micro-batch forward,
            # main.py:186,221); the pixel loss maps each micro-batch's rows
            # onto its GLOBAL image slots so grid_sizes (built once for the
            # full batch) stay aligned.
            b = batch.patches.shape[0]
            assert b % accum_steps == 0, (
                f"batch rows ({b}) must divide grad_accumulation_steps "
                f"({accum_steps}) — pad_batch_rows to a multiple"
            )
            mb = b // accum_steps

            if use_pixel_loss:
                from .pixel_loss import row_image_layout

                g_offsets, n_per_row = row_image_layout(batch)
                max_images = grid_sizes.shape[0]
                # images the pixel loss can actually average (slots beyond
                # max_images are dropped by make_grid_sizes)
                total_images = jnp.minimum(n_per_row.sum(), max_images).astype(
                    jnp.float32
                )
            tokens_per_row = (~batch.key_pad_mask).sum(axis=1).astype(jnp.float32)
            total_tokens = tokens_per_row.sum()

            def micro(i, vqs):
                sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb, axis=0)
                micro_batch = jax.tree_util.tree_map(sl, batch)
                rng_i = jax.random.fold_in(rng, i) if rng is not None else None
                tok_i = jax.lax.dynamic_slice_in_dim(tokens_per_row, i * mb, mb).sum()
                token_weight = tok_i * accum_steps / jnp.maximum(total_tokens, 1.0)
                pixel_rows, pixel_weight = None, None
                if use_pixel_loss:
                    row_off = jax.lax.dynamic_slice_in_dim(g_offsets, i * mb, mb)
                    counts = jax.lax.dynamic_slice_in_dim(n_per_row, i * mb, mb)
                    start, count = row_off[0], counts.sum()
                    slots = jnp.arange(max_images)
                    slot_mask = (slots >= start) & (slots < start + count)
                    pixel_rows = (row_off, slot_mask)
                    # n_i*K/N so the uniform micro average equals the
                    # whole-batch per-image mean (n_i = slots this micro owns
                    # inside the max_images window)
                    n_i = slot_mask.sum().astype(jnp.float32)
                    pixel_weight = (
                        n_i * accum_steps / jnp.maximum(total_images, 1.0)
                    )
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, vqs, patchnorm, micro_batch, state.step,
                    rng_i, grid_sizes, pixel_rows, pixel_weight, token_weight,
                    hparams,
                )

            def body(carry, i):
                gacc, macc, vqs, _ = carry
                (_, (metrics, new_vqs, vq_z)), grads = micro(i, vqs)
                if not is_vq:
                    new_vqs, vq_z = vqs, None
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                macc = jax.tree_util.tree_map(jnp.add, macc, metrics)
                return (gacc, macc, new_vqs, vq_z), None

            (_, (m0, vqs0, z0)), g0 = micro(0, state.vq_stats)
            if not is_vq:
                vqs0, z0 = state.vq_stats, None
            (grads, msum, new_vq_stats, vq_z), _ = jax.lax.scan(
                body, (g0, m0, vqs0, z0), jnp.arange(1, accum_steps)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            metrics = jax.tree_util.tree_map(lambda m: m / accum_steps, msum)
            if not is_vq:
                new_vq_stats = None
            # codebook surgery samples replacement codes from the batch; use
            # the LAST micro-batch (whose vq_z rode the scan carry out)
            surgery_mask = ~batch.key_pad_mask[(accum_steps - 1) * mb :]

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        if dynamic_hparams:
            # tx was built at unit peak lr; optax.adamw's last transform
            # multiplies the whole update (adam direction + decoupled weight
            # decay) by lr, so this per-trial scaling is exact
            lr_s = hparams["lr_scale"]
            updates = jax.tree_util.tree_map(lambda u: u * lr_s, updates)
        new_params = optax.apply_updates(state.params, updates)

        if new_vq_stats is None:
            new_vq_stats = state.vq_stats
        if is_vq and vq_z is not None:
            new_params, new_vq_stats, new_opt_state = _vq_codebook_surgery(
                new_params,
                new_vq_stats,
                new_opt_state,
                vq_z,
                surgery_mask,
                state.step,
                rng,
                kmeans_init=vq_kmeans_init,
                expire_threshold=vq_expire_threshold,
                expire_every=vq_expire_every,
            )

        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            step=state.step + 1,
            vq_stats=new_vq_stats,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def _zero_codebook_moments(opt_state: Any, replaced: jnp.ndarray, cb_shape) -> Any:
    """Zero Adam mu/nu rows for codebook entries replaced by surgery.

    Surgically replaced codes (k-means init, dead-code expiry) would otherwise
    inherit momentum accumulated for the OLD code at that slot, immediately
    perturbing the fresh value.  Moments are located structurally: any
    opt-state leaf shaped like the codebook whose tree path ends in a
    'codebook' key (Adam's mu and nu mirror the param tree)."""
    keep = (~replaced).astype(jnp.float32)[..., None]  # (z, 1) or (h, z, 1)

    def fix(path, leaf):
        if (
            hasattr(leaf, "shape")
            and tuple(leaf.shape) == tuple(cb_shape)
            and any(getattr(k, "key", None) == "codebook" for k in path)
        ):
            return leaf * keep.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, opt_state)


def _vq_codebook_surgery(
    params: Any,
    vq_stats: Any,
    opt_state: Any,
    vq_z: jnp.ndarray,  # (b, n, h, d) pre-quantization projections
    mask: jnp.ndarray,  # (b, n) valid tokens
    step: jnp.ndarray,
    rng: jnp.ndarray,
    kmeans_init: bool,
    expire_threshold: float,
    expire_every: int,
) -> Tuple[Any, Any, Any]:
    """In-jit functional codebook surgery for VQ training (see make_train_step).

    Guard: surgery samples replacement codes from the LAST accumulation
    micro-batch, and pipeline/accum row padding can make that chunk 100%
    padding — sampling from zero valid tokens would silently fill dead (or
    at k-means init, ALL) codebook rows with identical garbage projections.
    With no valid token in the window the surgery no-ops (`lax.cond` on
    mask.any()): expiry retries at its next cadence step; a skipped step-0
    k-means leaves the random init (the reference's kmeans_init=False
    behavior) — batches with >= accum x dp x microbatch real rows never
    hit this."""
    return jax.lax.cond(
        mask.any(),
        lambda ops: _vq_codebook_surgery_impl(
            ops[0], ops[1], ops[2], vq_z, mask, step, rng,
            kmeans_init, expire_threshold, expire_every,
        ),
        lambda ops: ops,
        (params, vq_stats, opt_state),
    )


def _vq_codebook_surgery_impl(
    params: Any,
    vq_stats: Any,
    opt_state: Any,
    vq_z: jnp.ndarray,
    mask: jnp.ndarray,
    step: jnp.ndarray,
    rng: jnp.ndarray,
    kmeans_init: bool,
    expire_threshold: float,
    expire_every: int,
) -> Tuple[Any, Any, Any]:
    """Documented deviation from the reference cadence: expire_codes_ runs
    every forward there (vector_quantize.py:489-507); here every expire_every
    steps (usage EMA still updates every step), and k-means init lands after
    step 0's gradient update rather than before its quantization."""
    from ..models.vq import (
        expire_dead_codes_ema_stats,
        expire_dead_codes_params,
        kmeans_init_from_batch,
    )

    rng_k, rng_e = jax.random.split(rng)
    if "codebook" not in params.get("vq_model", {}):
        # EMA-codebook mode: the codebook lives in vq_stats and maintains
        # itself inside apply; surgery targets the stats (the reference's
        # EuclideanCodebook expires dead codes in this mode too)
        stats = dict(vq_stats["vq_model"])
        if kmeans_init:

            def do_init(s):
                # reference init_embed_ invariant (vector_quantize.py:336-339):
                # cluster_size = kmeans bins and embed_avg = embed * bins, so
                # that embed == embed_avg / smoothed(cluster_size) holds from
                # the very first EMA update
                emb, bins = kmeans_init_from_batch(
                    s["embed"], vq_z, mask, rng_k, return_bins=True
                )
                out = dict(
                    s,
                    embed=emb,
                    embed_avg=(emb * bins[..., None]).astype(s["embed_avg"].dtype),
                )
                if "ema_cluster_size" in s:
                    out["ema_cluster_size"] = bins.astype(s["ema_cluster_size"].dtype)
                if "cluster_size" in s:
                    out["cluster_size"] = bins.astype(s["cluster_size"].dtype)
                return out

            stats = jax.lax.cond(step == 0, do_init, lambda s: dict(s), stats)
        if expire_threshold > 0 and expire_every > 0 and "cluster_size" in stats:
            stats = jax.lax.cond(
                (step % expire_every) == (expire_every - 1),
                lambda s: expire_dead_codes_ema_stats(
                    s, vq_z, mask, rng_e, expire_threshold
                ),
                lambda s: dict(s),
                stats,
            )
        vq_stats = dict(vq_stats, vq_model=stats)
        return params, vq_stats, opt_state

    cb = params["vq_model"]["codebook"]
    replaced = jnp.zeros(cb.shape[:-1], bool)

    if kmeans_init:
        cb, replaced = jax.lax.cond(
            step == 0,
            lambda c, r: (kmeans_init_from_batch(c, vq_z, mask, rng_k), jnp.ones_like(r)),
            lambda c, r: (c, r),
            cb,
            replaced,
        )

    if expire_threshold > 0 and expire_every > 0:
        cs = vq_stats["vq_model"]["cluster_size"]

        def do_expire(c, s, r):
            dead = s < expire_threshold
            c2, s2 = expire_dead_codes_params(c, s, vq_z, mask, rng_e, expire_threshold)
            return c2, s2, r | dead

        cb, cs, replaced = jax.lax.cond(
            (step % expire_every) == (expire_every - 1),
            do_expire,
            lambda c, s, r: (c, s, r),
            cb,
            cs,
            replaced,
        )
        vq_stats = dict(vq_stats)
        vq_stats["vq_model"] = dict(vq_stats["vq_model"], cluster_size=cs)

    opt_state = _zero_codebook_moments(opt_state, replaced, cb.shape)
    params = dict(params)
    params["vq_model"] = dict(params["vq_model"], codebook=cb)
    return params, vq_stats, opt_state


def model_state_sharding(
    state: TrainState,
    mesh: Mesh,
    tensor_parallel: bool = False,
    zero1: bool = False,
    min_size: int = 2**13,
) -> TrainState:
    """TrainState-shaped NamedSharding tree for params-at-rest sharding.

    tensor_parallel=True shards the master params AND their optimizer
    moments over the `model` axis by the Megatron TP rules
    (parallel.mesh._TP_RULES) — under tp the layout matches the compute
    layout (no per-step reshard); under pp the per-layer masters feed the
    (L,)-stacked stage view through one gather, and what pp buys is
    per-device parameter/moment MEMORY (total/n_model for the matched
    matrices), closing the replicated-masters caveat in
    parallel/pipeline.py.  Leaves whose shapes don't fit a rule (e.g.
    blockwise-int8 moment payloads) fall back to the zero1 spec or
    replication, so the layout composes with --opt_8bit.

    zero1=True additionally shards remaining sizeable optimizer moments
    over the DATA axis (parallel.mesh.zero1_opt_spec).

    Use the result both as the jit in/out sharding AND to `jax.device_put`
    the state before the first step — jit with explicit in_shardings
    requires committed arrays to already match.

    Donation hazard: device_put ALIASES the device-0 buffer for replicated
    shardings, so after the placed state is donated to the jitted step the
    SOURCE arrays (e.g. model.params the state was created from) are deleted
    too.  train() reassigns model.params from the live state before any use;
    external callers must not touch pre-placement arrays after step 1 (see
    tests/test_parallel.py::test_zero1_checkpoint_resume_exact)."""
    from jax.sharding import NamedSharding

    from ..parallel.mesh import (
        _TP_RULES,
        _path_str,
        param_sharding,
        zero1_opt_sharding,
    )

    rep = replicated(mesh)
    n_model = mesh.shape.get("model", 1)

    def fits(leaf, spec) -> bool:
        shape = tuple(getattr(leaf, "shape", ()) or ())
        if len(spec) > len(shape):
            return False
        for ax, name in enumerate(spec):
            if name is not None and shape[ax] % n_model != 0:
                return False
        return True

    if tensor_parallel:
        params_sh = param_sharding(state.params, mesh, tensor_parallel=True)
    else:
        params_sh = jax.tree_util.tree_map(lambda _: rep, state.params)

    if zero1:
        opt_sh = zero1_opt_sharding(state.opt_state, mesh, min_size)
    else:
        opt_sh = jax.tree_util.tree_map(lambda _: rep, state.opt_state)
    if tensor_parallel and n_model > 1:

        def tp_or(path, leaf, fallback):
            ps = _path_str(path)
            for pat, spec in _TP_RULES:
                if pat.match(ps) and fits(leaf, spec):
                    return NamedSharding(mesh, spec)
            return fallback

        opt_sh = jax.tree_util.tree_map_with_path(
            tp_or, state.opt_state, opt_sh
        )

    return TrainState(
        params=params_sh,
        opt_state=opt_sh,
        step=rep,
        vq_stats=jax.tree_util.tree_map(lambda _: rep, state.vq_stats),
    )


def zero1_state_sharding(
    state: TrainState, mesh: Mesh, min_size: int = 2**13
) -> TrainState:
    """ZeRO-1-only layout (params replicated, moments data-sharded) — see
    model_state_sharding for the generalized version."""
    return model_state_sharding(state, mesh, tensor_parallel=False, zero1=True, min_size=min_size)


def jit_train_step(
    train_step: Callable,
    mesh: Mesh,
    params_example: Any,
    tensor_parallel: bool = True,
    zero1_state: Optional[TrainState] = None,
    zero1_min_size: int = 2**13,
) -> Callable:
    """jit the train step over the mesh with explicit input shardings.

    The TrainState sharding is inferred from how its arrays were placed
    (`shard_params` for TP layouts); batch rows ride the data axis.  XLA
    inserts the gradient all-reduce / TP collectives.

    Covers the full 4-arg step signature (state, patchnorm, batch,
    grid_sizes) — call with grid_sizes=None explicitly when not using the
    pixel loss.

    zero1_state: pass the (example) TrainState to enable ZeRO-1 — optimizer
    moments get explicit data-axis shardings (parallel.mesh.zero1_opt_spec)
    pinned on both input AND output, so XLA lowers the update as
    reduce-scatter(grads) -> per-shard Adam -> all-gather(params) and each
    chip holds 1/n_data of the moments.  Params stay replicated (compose TP
    separately).
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    if zero1_state is None:
        # 4th arg = pixel-loss grid_sizes (small replicated array; None sharding)
        return jax.jit(
            train_step, in_shardings=(None, rep, bsh, None), donate_argnums=(0,)
        )
    state_sh = zero1_state_sharding(zero1_state, mesh, zero1_min_size)
    return jax.jit(
        train_step,
        in_shardings=(state_sh, rep, bsh, None),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )


def train_patch_norm(
    model: DCTAutoencoder,
    proc: DCTAutoencoderFeatureExtractor,
    data_iter: Iterable[dict],
    steps: int = 10,
    batch_size: int = 32,
    log: Callable[[str], None] = print,
) -> PatchNormState:
    """Norm-calibration phase (reference main.py:115-149, 388-404).

    Temporarily forces beta=0 (keep every patch) and max_seq_len to the full
    lossless grid so calibration sees unbiased per-position statistics.
    """
    og_beta, og_max = proc.sample_patches_beta, proc.max_seq_len
    proc.sample_patches_beta = 0.0
    proc.max_seq_len = proc.max_patch_h * proc.max_patch_w * proc.channels

    state = model.patchnorm
    n_seen = 0
    try:
        for i, batch in enumerate(proc.iter_batches(data_iter, batch_size)):
            if i >= steps:
                break
            n_seen += 1
            state, out = calibrate_patchnorm_batch(state, batch)
            valid = ~np.asarray(batch.key_pad_mask)
            vals = np.asarray(out)[valid]
            log(
                f"norm calib {i + 1:03d} median {np.median(vals):+.3f} "
                f"std {vals.std():.3f} min {vals.min():+.2f} max {vals.max():+.2f}"
            )
    finally:
        proc.sample_patches_beta = og_beta
        proc.max_seq_len = og_max
    if n_seen == 0:
        log(
            "WARNING: norm calibration saw ZERO batches — stats are untrained "
            "(check the resolution filter: images below 12x patch_size are dropped)"
        )
    model.patchnorm = state
    return state


def train(
    model: DCTAutoencoder,
    proc: DCTAutoencoderFeatureExtractor,
    data_iter: Iterable[dict],
    batch_size: int = 32,
    learning_rate: float = 1e-4,
    max_iters: int = 10000,
    grad_accumulation_steps: int = 1,
    loss_weights: Optional[Dict[str, float]] = None,
    warmup_dict: Optional[Dict[str, int]] = None,
    n_model_parallel: int = 1,
    # GPipe pipeline parallelism: >0 runs both transformer stacks as a
    # pipeline over the model axis with this many microbatches per step
    # (parallel/pipeline.py; requires n_model_parallel > 1 stages and
    # num_hidden_layers % stages == 0)
    pipeline_microbatches: int = 0,
    # ZeRO-1: shard optimizer moments over the data axis (each chip holds
    # 1/n_data of the Adam state; XLA inserts the reduce-scatter/all-gather).
    # Memory lever for large configs on small meshes; single-host
    # checkpointing gathers transparently, multi-host save requires the
    # orbax tier (it writes sharded arrays natively).
    zero1: bool = False,
    # 8-bit Adam moment state (train/opt8bit.py; reference PagedAdamW8bit
    # counterpart, main.py:420-425) — ~2 bytes/param instead of 8
    opt_8bit: bool = False,
    use_pixel_loss: bool = False,
    pixel_loss_max_images: int = 64,
    prefetch_batches: int = 2,
    # 'abort' = reference parity (main.py:267-269); 'restore' = elastic
    # recovery: on a non-finite loss, roll back to the last saved train
    # state and keep consuming the stream.  REQUIRES out_dir + save_every
    # (before the first save there is no clean state — current params are
    # poisoned and the originals were donated to the jitted step — so it
    # aborts with an explanatory error)
    nan_policy: str = "abort",
    # host-RSS watchdog (see RssLimitExceeded): when RSS crosses the limit,
    # checkpoint to out_dir and raise for a process restart instead of being
    # OOM-killed mid-interval by the kernel. <0 = auto (75% of MemTotal);
    # 0 disables; requires out_dir to act (logs a warning otherwise)
    rss_limit_gb: float = -1.0,
    # stall watchdog: if no training step COMPLETES for this many seconds
    # (after the first step, so compiles don't count), call on_stall from a
    # daemon thread.  Covers the hang class the RSS watchdog cannot: a
    # device dispatch wedged inside the client (observed on the remote-TPU
    # tunnel: a run froze mid-step in a futex with the kernel thread idle —
    # unrecoverable from Python since the main thread never returns).
    # 0 disables.  on_stall runs OFF the main thread: it must not touch
    # jax/train state; the CLI passes an execv self-restart that resumes
    # from the last on-disk checkpoint (up to save_every steps replayed);
    # when on_stall is None the watchdog logs and os._exit(73)s so a
    # supervisor can restart (library callers: the checkpoint is on disk).
    stall_timeout_s: float = 0.0,
    on_stall=None,
    log_every: int = 50,
    save_every: int = 1000,
    # keep a model-only copy of each periodic save at out_dir/ckpt_<step>
    # (for per-checkpoint eval, tools/eval.py) instead of overwriting
    keep_checkpoints: bool = False,
    log_images_every: int = 0,
    n_log_images: int = 10,
    out_dir: Optional[str] = None,
    resume_path: Optional[str] = None,
    # VQ training knobs (reference threshold_ema_dead_code / kmeans_init,
    # modeling_dct_autoencoder.py:77): see make_train_step
    seed: int = 0,
    vq_kmeans_init: bool = True,
    vq_expire_threshold: float = 15.0,
    vq_expire_every: int = 50,
    log: Callable[[Dict], None] = print,
) -> Tuple[DCTAutoencoder, TrainState]:
    """Main training loop (reference main.py:151-280).

    use_pixel_loss=True trains with the differentiable RGB pixel loss in the
    objective (reference main.py:221, decode_pixels=use_pixel_loss); the term
    enters the weighted sum with weight loss_weights.get('pixel_loss', 1.0),
    matching the reference's fallback weight for terms not in loss_weight.

    log_images_every > 0 writes an original-vs-reconstruction grid to out_dir
    every that many steps (reference main.py:195-214)."""
    tx = make_optimizer(learning_rate, max_iters, opt_8bit=opt_8bit)
    state = TrainState.create(model.params, tx, model.vq_stats)
    if resume_path is not None:
        from .checkpoint import has_train_state, load_train_state

        if has_train_state(resume_path):
            state, model.patchnorm = load_train_state(resume_path, state, model.patchnorm)
            log({"resumed_from": resume_path, "step": int(state.step)})
    mesh = make_mesh(n_model_parallel)

    train_module = model.module
    if pipeline_microbatches > 0:
        from ..parallel.pipeline import make_pipelined_module

        assert n_model_parallel > 1, "pipeline needs >1 stages (n_model_parallel)"
        train_module = make_pipelined_module(
            model.module, mesh, pipeline_microbatches
        )

    step_fn = make_train_step(
        train_module,
        tx,
        loss_weights,
        warmup_dict,
        grad_accumulation_steps,
        use_pixel_loss=use_pixel_loss,
        seed=seed,
        vq_kmeans_init=vq_kmeans_init,
        vq_expire_threshold=vq_expire_threshold,
        vq_expire_every=vq_expire_every,
    )
    clip_grid = (model.config.max_patch_h, model.config.max_patch_w)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    # sequence_parallel's sharding constraints key on an ambient mesh set
    # via jax.set_mesh (parallel/mesh.py:sp_scatter). set_mesh also makes
    # every host->device array creation COMMITTED to the mesh (replicated —
    # a full-batch broadcast), which both conflicts with jit in_shardings on
    # uncommitted args AND would re-reshard every step; so SP batches are
    # explicitly device_put to the data sharding first, and set_mesh wraps
    # ONLY the jitted call (the ambient mesh matters at trace time).
    sp_on = getattr(model.config.encoder_config, "sequence_parallel", False) or getattr(
        model.config.decoder_config, "sequence_parallel", False
    )
    sp_ctx = (lambda: jax.set_mesh(mesh)) if sp_on else contextlib.nullcontext
    with mesh:
        tp_at_rest = n_model_parallel > 1
        if zero1 or tp_at_rest:
            # params-at-rest layout: master params (+ moments) sharded over
            # the model axis under tp/pp, moments over data under zero1 —
            # pinned on jit input AND output so the state stays sharded
            ssh = model_state_sharding(
                state, mesh, tensor_parallel=tp_at_rest, zero1=zero1
            )
            state = jax.device_put(state, ssh)
            jitted = jax.jit(
                step_fn,
                in_shardings=(ssh, rep, bsh, None),
                out_shardings=(ssh, None),
                donate_argnums=(0,),
            )
        else:
            jitted = jax.jit(
                step_fn, in_shardings=(None, rep, bsh, None), donate_argnums=(0,)
            )

        t0 = time.time()
        n_data = mesh.shape["data"]
        i = -1
        # max_iters counts TOTAL steps across restarts: a resumed state
        # starts at step>0 and runs only the remainder
        start_step = int(state.step)
        if rss_limit_gb < 0:
            rss_limit_gb = _auto_rss_limit_gb()
        stall_progress = {"t": None, "done": False}
        if stall_timeout_s and stall_timeout_s > 0:
            _start_stall_watchdog(stall_timeout_s, stall_progress, on_stall, log)
        batch_iter = proc.iter_batches(data_iter, batch_size)
        if prefetch_batches > 0:
            # overlap host-side decode/preprocess/packing of batch i+1 with
            # device execution of batch i (replaces the reference's
            # DataLoader workers, main.py:175-181)
            from ..data.prefetch import prefetch

            batch_iter = prefetch(batch_iter, prefetch_batches)
        for i, raw_batch in enumerate(batch_iter):
            if i >= max_iters - start_step:
                break
            # global step across restarts (resume starts at state.step)
            gstep = start_step + i
            batch, grid_sizes = prepare_train_batch(
                raw_batch,
                pixel_loss_max_images if use_pixel_loss else 0,
                clip_grid,
            )
            # pad AFTER stripping: the (b,1,s,s) attn_mask would otherwise be
            # row-padded (a multi-MB copy per step) just to be discarded.
            # Padding rows are fully masked, so grid_sizes (built pre-pad)
            # stay aligned — pads add rows, not images.  Rows must divide
            # BOTH the data axis and the micro-batch count, hence the lcm.
            # with pipelining each accum chunk's per-data-shard rows must
            # further divide into pipeline microbatches
            row_multiple = math.lcm(n_data, grad_accumulation_steps)
            if pipeline_microbatches > 0:
                row_multiple = (
                    grad_accumulation_steps * n_data * pipeline_microbatches
                )
            batch = pad_batch_rows(batch, row_multiple)
            if sp_on:
                # place rows to the data sharding OUTSIDE set_mesh (under it
                # they'd commit replicated and re-reshard every step)
                batch = jax.device_put(batch, bsh)
            with sp_ctx():
                state, metrics = jitted(state, model.patchnorm, batch, grid_sizes)
            # dispatch returned (async is fine — a wedged client blocks the
            # dispatch itself, which is the signal the watchdog needs)
            stall_progress["t"] = time.monotonic()

            if i % log_every == 0:
                metrics = {
                    k: float(v) for k, v in metrics.items() if np.ndim(v) == 0
                }
                loss = metrics["loss"]
                if not np.isfinite(loss):
                    if nan_policy == "restore":
                        # elastic recovery (beyond the reference's abort):
                        # roll back to the last saved train state and keep
                        # consuming the stream — a poisoned batch window is
                        # skipped rather than ending the run
                        from .checkpoint import has_train_state, load_train_state

                        if out_dir and has_train_state(out_dir):
                            state, model.patchnorm = load_train_state(
                                out_dir, state, model.patchnorm
                            )
                            if zero1 or tp_at_rest:
                                # restored leaves are host arrays; re-place to
                                # the pinned shardings before the next jitted
                                # call (committed args must match)
                                state = jax.device_put(state, ssh)
                            log(
                                {
                                    "step": gstep,
                                    "warning": "NAN LOSS — restored last "
                                    f"checkpoint (step {int(state.step)}), continuing",
                                }
                            )
                            continue
                        # no clean state exists to roll back to: the current
                        # params are poisoned and the originals were DONATED
                        # to the jitted step (buffers deleted) — restore
                        # requires out_dir + save_every
                        log(
                            {
                                "step": gstep,
                                "error": "NAN LOSS — nan_policy='restore' needs "
                                "a checkpoint (set out_dir + save_every); aborting",
                            }
                        )
                        break
                    # NaN abort (reference main.py:267-269)
                    log({"step": gstep, "error": "NAN LOSS — aborting"})
                    break
                metrics.update(
                    step=gstep,
                    sec_per_step=(time.time() - t0) / max(i, 1),
                    images_per_batch=len(raw_batch.original_sizes),
                )
                log(metrics)

            if out_dir and log_images_every and gstep % log_images_every == 0:
                from ..tools.viz import make_image_grid

                model.params = state.params
                model.vq_stats = state.vq_stats
                out = model.forward(model.normalize_(raw_batch), training=False)
                rec = model.inv_normalize_(out["dct_patches"])
                rec = rec.replace(
                    patch_sizes=raw_batch.patch_sizes,
                    original_sizes=raw_batch.original_sizes,
                )
                rec_images = proc.postprocess(rec)
                orig_images = proc.postprocess(raw_batch)  # raw patches
                # RGB-space pixel MSE metric (reference main.py:95-110; here a
                # metric only — the host-side unpatch is not differentiated)
                pixel_loss = float(
                    np.mean(
                        [np.mean((np.clip(r, 0, 1) - o) ** 2) for r, o in zip(rec_images, orig_images)]
                    )
                )
                log({"step": gstep, "pixel_loss": pixel_loss})
                make_image_grid(
                    orig_images[:n_log_images],
                    [np.clip(r, 0, 1) for r in rec_images[:n_log_images]],
                    filename=f"{out_dir}/train_image_{gstep:06d}.png",
                )

            if out_dir and save_every and i > 0 and gstep % save_every == 0:
                from .checkpoint import save_train_state

                # never checkpoint a poisoned state: a NaN can appear between
                # log steps, and nan_policy='restore' would then restore the
                # poisoned checkpoint forever
                if np.isfinite(float(metrics["loss"])):
                    model.params = state.params
                    model.vq_stats = state.vq_stats
                    model.save_pretrained(f"{out_dir}/model")
                    save_train_state(out_dir, state, model.patchnorm)
                    if keep_checkpoints:
                        model.save_pretrained(f"{out_dir}/ckpt_{gstep:06d}")
                else:
                    log({"step": gstep, "warning": "skipping checkpoint: non-finite loss"})

            # RSS watchdog (see RssLimitExceeded): in environments whose
            # device client leaks host memory per transfer, checkpoint and
            # hand control back for a process restart BEFORE the kernel's
            # OOM killer fires mid-interval
            # i > 0: a restarted process must make at least one step of
            # progress before it may restart again (no restart livelock)
            # own cadence, NOT log_every: a user-set large log_every would
            # let the ~batch-bytes/step leak blow through the headroom
            # between checks (ADVICE r3)
            if rss_limit_gb and i > 0 and i % min(log_every, 50) == 0:
                rss = _rss_gb()
                if rss > rss_limit_gb:
                    if not out_dir:
                        log(
                            {
                                "step": gstep,
                                "warning": f"RSS {rss:.1f} GB over limit but no "
                                "out_dir to checkpoint to — continuing at risk",
                            }
                        )
                    elif not np.isfinite(float(metrics.get("loss", np.nan))):
                        log(
                            {
                                "step": gstep,
                                "warning": f"RSS {rss:.1f} GB over limit but loss "
                                "is non-finite — skipping checkpoint, no restart",
                            }
                        )
                    else:
                        from .checkpoint import save_train_state

                        model.params = state.params
                        model.vq_stats = state.vq_stats
                        model.save_pretrained(f"{out_dir}/model")
                        save_train_state(out_dir, state, model.patchnorm)
                        if hasattr(batch_iter, "close"):
                            batch_iter.close()
                        log(
                            {
                                "step": gstep,
                                "warning": f"RSS {rss:.1f} GB > {rss_limit_gb:.1f} GB"
                                " — checkpointed; raising for restart",
                            }
                        )
                        raise RssLimitExceeded(gstep, rss, out_dir)

        # shut the prefetch worker down promptly (its generator-finally joins
        # the thread; a thread killed mid-device-call at interpreter teardown
        # aborts the process on the remote backend)
        stall_progress["done"] = True
        if hasattr(batch_iter, "close"):
            batch_iter.close()

    if i < 0:
        log(
            {
                "error": "training stream produced ZERO batches — check the "
                "resolution filter (min 12x patch_size) and dataset paths"
            }
        )
    model.params = state.params
    model.vq_stats = state.vq_stats
    if out_dir:
        from .checkpoint import save_train_state

        model.save_pretrained(f"{out_dir}/model")
        save_train_state(out_dir, state, model.patchnorm)
    return model, state
