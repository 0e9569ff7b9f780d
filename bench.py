"""Benchmark: patch14-L encode+decode throughput (images/s) on one chip.

Measures the BASELINE.md headline: encode+decode of packed variable-length
image token streams through the flagship patch14-L autoencoder (two 8-layer
hidden-1024 CLIP stacks + LFQ 16x8192) in bfloat16, eval mode.

Methodology: synthetic packed batches built with the REAL packing pipeline —
per-image token counts drawn from TruncExp(beta=0.02) exactly as preprocessing
does, greedily packed into 256-token rows — so images/batch reflects real
workload statistics.  Steady-state wall clock over jitted steps; first call
(compile) excluded.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.json north-star of 2000 images/s/chip.
"""
import json
import math
import random
import time

import numpy as np


def build_packed_batch(cfg, max_seq_len=256, rows=64, beta=0.02, seed=0):
    """Pack TruncExp-sized fake images into rows with the real packer."""
    from dct_autoencoder_tpu.patches.packing import (
        batch_groups,
        group_patches_by_max_seq_len,
    )

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    items = []
    sizes = []
    # generate enough images to fill `rows` rows
    est_tokens = rows * max_seq_len
    total = 0
    while total < est_tokens * 1.05:
        k = min(max(1, round(-1.0 / beta * math.log(rng.random()))), max_seq_len)
        patches = nprng.standard_normal((k, cfg.patch_dim)).astype(np.float32)
        pos = nprng.integers(0, 32, size=(k, 2)).astype(np.int32)
        ch = nprng.integers(0, 3, size=(k,)).astype(np.int32)
        items.append((patches, pos, ch))
        sizes.append((32, 32))
        total += k

    state = group_patches_by_max_seq_len(items, max_seq_len)
    groups = state.groups[:rows]
    n_images = sum(len(g) for g in groups)
    batch = batch_groups(
        groups,
        max_seq_len,
        patch_sizes=tuple(sizes[:n_images]),
        original_sizes=tuple((448, 448) for _ in range(n_images)),
    )
    return batch, n_images


def bench_e2e():
    """Full pipeline on real fixture images: decode->preprocess->pack->
    normalize->model->unpack->pixels (BASELINE configs 2-3).  Images are
    bucketed to one shape so the whole run uses two compiled programs."""
    import os
    import time

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dct_autoencoder_tpu.models.config import DCTAutoencoderConfig
    from dct_autoencoder_tpu.models.factory import get_model_and_processor
    from dct_autoencoder_tpu.models.patchnorm import calibrate_patchnorm_batch

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = DCTAutoencoderConfig.from_json_file(os.path.join(here, "conf", "patch14-l.json"))
    model, proc = get_model_and_processor(cfg, dtype=jnp.bfloat16, sample_patches_beta=0.02)

    img_dir = "/root/reference/images"
    files = sorted(f for f in os.listdir(img_dir) if f.lower().endswith((".jpg", ".jpeg")))
    ims = []
    for f in files:
        im = Image.open(os.path.join(img_dir, f)).convert("RGB").resize((448, 448), Image.BICUBIC)
        # ship uint8; the extractor converts on device (4x less H2D transfer)
        ims.append(np.asarray(im, dtype=np.uint8).transpose(2, 0, 1))
    # replicate to a meaningful workload
    reps = int(os.environ.get("BENCH_E2E_REPS", "8"))
    ims = ims * reps

    def run_once():
        import random as _r

        # identical stochastic budgets every run -> identical batch shapes ->
        # both device programs compile exactly once
        proc.rng = _r.Random(0)
        ds = proc.preprocess_many(ims)
        cols = {k: [d[k] for d in ds] for k in ds[0]}
        batches = list(proc.iter_batches(iter([cols]), batch_size=None))
        outs = []
        for batch in batches:
            nb = model.normalize_(batch)
            out = model.forward(nb, training=False)
            outs.append(out["codes"])
        return outs

    # fresh-init patchnorm stats (median 0 / b 1) keep normalize well-defined
    # without compiling a third device program for calibration

    run_once()  # compile both programs
    t0 = time.perf_counter()
    outs = run_once()
    jax.block_until_ready(outs)
    float(np.asarray(outs[-1]).sum())
    dt = time.perf_counter() - t0
    import sys

    print(
        "# e2e note: in this environment the TPU sits behind a slow tunnel "
        "(~5-30 MB/s); this metric is dominated by shipping the raw images "
        "host->device, not device compute (see BENCH_MODE=model/dct for "
        "device-side throughput)",
        file=sys.stderr,
    )
    return {
        "metric": "patch14l_e2e_pipeline_throughput",
        "value": round(len(ims) / dt, 1),
        "unit": "images/s/chip",
        "vs_baseline": round(len(ims) / dt / 2000.0, 3),
    }


def bench_dct():
    """BASELINE config 1: IPT+DCT -> patchify -> patchnorm roundtrip -> IDCT
    -> RGB on baboon.jpg (no model)."""
    import os
    import time

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dct_autoencoder_tpu.ops.colorspace import ipt_to_rgb, rgb_to_ipt
    from dct_autoencoder_tpu.ops.dct import dct2, idct2

    im = Image.open("/root/reference/images/baboon.jpg").convert("RGB")
    im = im.resize((512, 512), Image.BICUBIC)
    x = np.asarray(im, dtype=np.float32).transpose(2, 0, 1) / 255.0
    batch = jnp.asarray(np.stack([x] * 32))

    def roundtrip(b):
        y = dct2(rgb_to_ipt(b))
        return ipt_to_rgb(idct2(y))

    n = 20

    @jax.jit
    def chain(b):
        out = jax.lax.fori_loop(0, n, lambda _, x: roundtrip(x), b)
        return jnp.sum(out), jnp.max(jnp.abs(out - b))

    s, err = chain(batch)
    err = float(np.asarray(err))
    assert err < 0.05, f"roundtrip error after {n} chained roundtrips: {err}"
    t0 = time.perf_counter()
    s, _ = chain(batch)
    float(np.asarray(s))
    dt = (time.perf_counter() - t0) / n
    return {
        "metric": "dct_roundtrip_throughput",
        "value": round(batch.shape[0] / dt, 1),
        "unit": "images/s/chip",
        "vs_baseline": 0.0,
    }


def measure_model_throughput(module, params, batch, n_images, cfg, n_iters=20):
    """Steady-state model throughput via N chained forwards inside ONE jit.

    Each iteration consumes the previous reconstruction, so nothing can be
    cached or overlapped, and per-call tunnel/dispatch overhead is excluded.
    Sync is a scalar fetch (np.asarray on the checksum) — block_until_ready
    alone is not a reliable barrier on the axon remote backend.
    """
    import functools

    import jax
    import jax.numpy as jnp

    def chain(params, batch, n):
        def body(_, patches):
            out = module.apply(
                {"params": params}, batch.replace(patches=patches), training=False
            )
            return out["dct_patches"].patches.astype(jnp.float32)

        final = jax.lax.fori_loop(0, n, body, batch.patches)
        return jnp.sum(final)

    chain1 = jax.jit(functools.partial(chain, n=1))
    chainN = jax.jit(functools.partial(chain, n=n_iters))

    # compile + warmup both programs
    float(np.asarray(chain1(params, batch)))
    float(np.asarray(chainN(params, batch)))

    # time the N-iteration program; subtract one-iteration program time to
    # remove the fixed dispatch cost
    t0 = time.perf_counter()
    sN = float(np.asarray(chainN(params, batch)))
    dtN = time.perf_counter() - t0
    t0 = time.perf_counter()
    s1 = float(np.asarray(chain1(params, batch)))
    dt1 = time.perf_counter() - t0
    assert np.isfinite(sN) and np.isfinite(s1)
    sec_per_batch = max(dtN - dt1, 1e-9) / (n_iters - 1)
    images_per_sec = n_images / sec_per_batch

    # rough FLOP accounting for context (two stacks)
    tokens = batch.patches.shape[0] * batch.patches.shape[1]
    enc = cfg.encoder_config
    per_layer = 4 * enc.hidden_size**2 + 2 * enc.hidden_size * enc.intermediate_size
    n_layers = enc.num_hidden_layers + cfg.decoder_config.num_hidden_layers
    flops = 2 * tokens * per_layer * n_layers
    tflops = flops / sec_per_batch / 1e12
    return images_per_sec, sec_per_batch, tflops


def bench_calibrated():
    """Headline methodology on REAL activations: fixture images preprocessed
    on-device, packed with the real packer, patchnorm CALIBRATED on them, the
    batch normalized with those stats — then the same chained-forward
    measurement as the synthetic headline.  Proves the headline number holds
    when the model sees real image statistics (VERDICT r1 'weak' item 2)."""
    import os
    import random as _r

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dct_autoencoder_tpu.models.config import DCTAutoencoderConfig
    from dct_autoencoder_tpu.models.factory import get_model_and_processor
    from dct_autoencoder_tpu.models.patchnorm import calibrate_patchnorm_batch

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = DCTAutoencoderConfig.from_json_file(os.path.join(here, "conf", "patch14-l.json"))
    model, proc = get_model_and_processor(cfg, dtype=jnp.bfloat16, sample_patches_beta=0.02)
    proc.rng = _r.Random(0)

    img_dir = "/root/reference/images"
    files = sorted(f for f in os.listdir(img_dir) if f.lower().endswith((".jpg", ".jpeg")))
    ims = []
    for f in files:
        im = Image.open(os.path.join(img_dir, f)).convert("RGB").resize((448, 448), Image.BICUBIC)
        ims.append(np.asarray(im, dtype=np.uint8).transpose(2, 0, 1))
    rows = int(os.environ.get("BENCH_ROWS", "64"))
    # enough stochastic-budget draws to fill `rows` packed rows
    reps = max(1, (rows * 256) // (len(ims) * 50))
    ims = ims * reps

    ds = proc.preprocess_many(ims)
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batch = next(proc.iter_batches(iter([cols]), batch_size=rows, drain=True))
    n_images = len(batch.original_sizes)

    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    nb = model.normalize_(batch)

    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), model.params)
    n_iters = int(os.environ.get("BENCH_ITERS", "20"))
    images_per_sec, sec_per_batch, tflops = measure_model_throughput(
        model.module, params, nb, n_images, cfg, n_iters
    )
    import sys

    print(
        f"# calibrated: rows={nb.patches.shape[0]} images/batch={n_images} "
        f"sec/batch={sec_per_batch * 1e3:.1f}ms ~{tflops:.1f} TFLOP/s",
        file=sys.stderr,
    )
    return {
        "metric": "patch14l_encode_decode_throughput_calibrated",
        "value": round(images_per_sec, 1),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / 2000.0, 3),
    }


def bench_latency():
    """Single-image serving latency, per stage, on-device (chained-jit
    methodology): fused preprocess front-end, model encode+decode (1 row x
    256 tokens), fused decode front-end at 448px."""
    import functools
    import os

    import jax
    import jax.numpy as jnp

    from dct_autoencoder_tpu.kernels.dct_patchify import fused_ipt_dct_patchify
    from dct_autoencoder_tpu.kernels.idct_unpatchify import fused_idct_unpatchify_rgb
    from dct_autoencoder_tpu.models.autoencoder import DCTAutoencoderModule
    from dct_autoencoder_tpu.models.config import DCTAutoencoderConfig

    def timeit(chain, *xs, iters=20):
        # operands as jit ARGUMENTS, not closures: embedded constants blow
        # the remote-compile payload limit (HTTP 413) through the tunnel
        chain1 = jax.jit(functools.partial(chain, n=1))
        chainN = jax.jit(functools.partial(chain, n=iters))
        float(np.asarray(chain1(*xs)))
        float(np.asarray(chainN(*xs)))
        t0 = time.perf_counter(); float(np.asarray(chainN(*xs))); dtN = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(chain1(*xs))); dt1 = time.perf_counter() - t0
        return max(dtN - dt1, 1e-9) / (iters - 1)

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = DCTAutoencoderConfig.from_json_file(os.path.join(here, "conf", "patch14-l.json"))
    module = DCTAutoencoderModule(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    im = jnp.asarray(rng.uniform(0, 1, (1, 3, 448, 448)).astype(np.float32))

    def chain_pre(im, n):
        def body(_, x):
            t = fused_ipt_dct_patchify(x, cfg.patch_size, 448, 448)
            return x + 1e-30 * jnp.mean(t)
        return jnp.sum(jax.lax.fori_loop(0, n, body, im))

    batch, _ = build_packed_batch(cfg, max_seq_len=256, rows=1)
    params = module.init(jax.random.PRNGKey(0), batch, training=False)["params"]
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    def chain_model(params, patches0, n):
        def body(_, patches):
            out = module.apply(
                {"params": params}, batch.replace(patches=patches), training=False
            )
            return out["dct_patches"].patches.astype(jnp.float32)
        return jnp.sum(jax.lax.fori_loop(0, n, body, patches0))

    plane = jnp.asarray(rng.standard_normal((1, 3, 434, 434)).astype(np.float32) * 0.1)

    def chain_post(plane, n):
        def body(_, y):
            px = fused_idct_unpatchify_rgb(y, 448, 448)
            return y + 1e-30 * jnp.mean(px)
        return jnp.sum(jax.lax.fori_loop(0, n, body, plane))

    t_pre = timeit(chain_pre, im)
    t_model = timeit(chain_model, params, batch.patches)
    t_post = timeit(chain_post, plane)
    total_ms = (t_pre + t_model + t_post) * 1e3
    import sys

    print(
        f"# latency(448px, 1 image): preprocess={t_pre*1e3:.2f}ms "
        f"model={t_model*1e3:.2f}ms decode={t_post*1e3:.2f}ms",
        file=sys.stderr,
    )
    return {
        "metric": "patch14l_single_image_latency",
        "value": round(total_ms, 2),
        "unit": "ms",
        "vs_baseline": 0.0,
    }


def bench_ar():
    """AR sampling throughput: the one-program scan sampler
    (models/ar.py:sample_codes_scan[_batched]) on a 33.6M decoder.

    AR_BATCH=N samples N layouts at once (vmapped; the b=1 sampler is
    per-step-latency-bound, so batched tok/s scales nearly with N).
    AR_TOKENS sets the sequence length (default 256). Steady-state best of
    3 runs, synced via int() on the last token."""
    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dct_autoencoder_tpu.models.ar import (
        ARConfig,
        ARTokenModel,
        sample_codes_scan,
        sample_codes_scan_batched,
    )
    from dct_autoencoder_tpu.models.config import TransformerConfig

    S = int(os.environ.get("AR_TOKENS", "256"))
    B = int(os.environ.get("AR_BATCH", "1"))
    cfg = ARConfig(
        codebook_size=1024,
        num_codebooks=8,
        image_channels=3,
        max_patch_h=32,
        max_patch_w=32,
        transformer=TransformerConfig(
            hidden_size=512, intermediate_size=2048,
            num_hidden_layers=8, num_attention_heads=8,
        ),
    )
    rng = np.random.default_rng(0)
    chans = jnp.asarray(rng.integers(0, 3, (B, S)).astype(np.int32))
    poss = jnp.asarray(rng.integers(0, 32, (B, S, 2)).astype(np.int32))
    codes0 = jnp.asarray(rng.integers(0, 1024, (1, S, 8)).astype(np.int32))
    pad = jnp.zeros((1, S), bool)
    model = ARTokenModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), codes0, chans[:1], poss[:1], pad, training=False
    )["params"]

    sample = (
        (lambda k: sample_codes_scan(cfg, params, chans, poss, k))
        if B == 1
        else (lambda k: sample_codes_scan_batched(cfg, params, chans, poss, k))
    )
    _ = int(np.asarray(sample(jax.random.PRNGKey(0))[0, -1, 0]))  # compile
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        out = sample(jax.random.PRNGKey(1 + i))
        # sync via a device-side scalar slice — pulling the whole (B,S,8)
        # array through the ~30 MB/s tunnel would bill transfer as sampling
        _ = int(np.asarray(out[-1, -1, 0]))
        best = min(best, time.time() - t0)
    toks = B * S / best
    return {
        "metric": f"ar_scan_sampling_b{B}",
        "value": round(toks, 1),
        "unit": "tokens/s/chip",
        # per-step dispatch loop measured 2 tok/s at this shape (b=1,
        # docs/components.md) — the one-program scan is the baseline-defining
        # improvement; vs_baseline reports against that
        "vs_baseline": round(toks / 2.0, 1),
    }


def main():
    import jax
    import jax.numpy as jnp

    from dct_autoencoder_tpu.models.autoencoder import DCTAutoencoderModule
    from dct_autoencoder_tpu.models.config import DCTAutoencoderConfig

    import os

    mode = os.environ.get("BENCH_MODE", "model")
    if mode == "e2e":
        print(json.dumps(bench_e2e()))
        return
    if mode == "dct":
        print(json.dumps(bench_dct()))
        return
    if mode == "calibrated":
        print(json.dumps(bench_calibrated()))
        return
    if mode == "latency":
        print(json.dumps(bench_latency()))
        return
    if mode == "ar":
        print(json.dumps(bench_ar()))
        return

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = DCTAutoencoderConfig.from_json_file(os.path.join(here, "conf", "patch14-l.json"))
    if mode == "int8":
        # int8 serving path (models/quant.py); INT8_MODE=weight_only|dynamic,
        # INT8_BF16_LAYERS=comma list of layer idxs kept bf16 in both stacks
        # (the token-agreement lever, docs/int8_study_r3.md)
        int8_mode = os.environ.get("INT8_MODE", "weight_only")
        bf16_layers = tuple(
            int(i) for i in os.environ.get("INT8_BF16_LAYERS", "").split(",") if i
        )
        group_size = int(os.environ.get("INT8_GROUP_SIZE", "0"))
        for tc in (cfg.encoder_config, cfg.decoder_config):
            tc.quantize_int8 = True
            tc.quantize_int8_mode = int8_mode
            tc.quantize_int8_bf16_layers = bf16_layers
            tc.quantize_int8_group_size = group_size
    if os.environ.get("BENCH_ATTN"):
        cfg.attention_impl = os.environ["BENCH_ATTN"]
    module = DCTAutoencoderModule(cfg, dtype=jnp.bfloat16)

    rows = int(os.environ.get("BENCH_ROWS", "64"))
    batch, n_images = build_packed_batch(cfg, max_seq_len=256, rows=rows)

    params = module.init(jax.random.PRNGKey(0), batch, training=False)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x if x.dtype == jnp.int8 else x.astype(jnp.bfloat16), params
    )

    n_iters = int(os.environ.get("BENCH_ITERS", "20"))
    images_per_sec, sec_per_batch, tflops = measure_model_throughput(
        module, params, batch, n_images, cfg, n_iters
    )

    result = {
        "metric": "patch14l_encode_decode_throughput"
        + ("_int8" if mode == "int8" else ""),
        "value": round(images_per_sec, 1),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / 2000.0, 3),
    }
    print(json.dumps(result))
    import sys

    print(
        f"# rows={rows} images/batch={n_images} sec/batch={sec_per_batch * 1e3:.1f}ms "
        f"~{tflops:.1f} TFLOP/s model-matmul",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
