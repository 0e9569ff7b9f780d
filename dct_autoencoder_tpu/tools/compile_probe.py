"""Compile-compatibility + latency probe (reference: test_compile.py).

Builds a model from a config, jit-compiles the forward (the torch.compile
fullgraph counterpart — under jax everything is whole-graph by construction),
reports compile time and steady-state per-batch latency, and optionally writes
a jax.profiler trace for inspection in TensorBoard/Perfetto.

Usage:
  python -m dct_autoencoder_tpu.tools.compile_probe \
      --model_config_path conf/patch14-l.json --rows 16 --profile_dir /tmp/trace
"""
from __future__ import annotations

import argparse
import time
from typing import Optional

import numpy as np


def main(
    model_config_path: str = "./conf/patch14-l.json",
    rows: int = 16,
    seq_len: int = 256,
    iters: int = 10,
    dtype: str = "bfloat16",
    profile_dir: Optional[str] = None,
    platform: str = "default",
):
    from . import set_platform

    set_platform(platform)
    import jax
    import jax.numpy as jnp

    from ..models.autoencoder import DCTAutoencoderModule
    from ..models.config import DCTAutoencoderConfig
    from bench import build_packed_batch  # bench.py at repo root

    cfg = DCTAutoencoderConfig.from_json_file(model_config_path)
    jdtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    module = DCTAutoencoderModule(cfg, dtype=jdtype)
    batch, n_images = build_packed_batch(cfg, max_seq_len=seq_len, rows=rows)

    params = module.init(jax.random.PRNGKey(0), batch, training=False)["params"]
    if jdtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd(params, batch, patches):
        out = module.apply({"params": params}, batch.replace(patches=patches), training=False)
        return out["dct_patches"].patches.astype(jnp.float32)

    t0 = time.perf_counter()
    p = fwd(params, batch, batch.patches)
    float(np.asarray(p).sum())
    compile_s = time.perf_counter() - t0
    print(f"compile + first batch: {compile_s:.1f}s")

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    t0 = time.perf_counter()
    for _ in range(iters):
        p = fwd(params, batch, p)
    float(np.asarray(p).sum())
    dt = (time.perf_counter() - t0) / iters

    if profile_dir:
        jax.profiler.stop_trace()
        print("trace written to", profile_dir)

    print(
        f"time taken per batch: {dt * 1e3:.1f}ms  "
        f"({rows} rows x {seq_len} tokens, {n_images} images -> {n_images / dt:.0f} images/s)"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_config_path", default="./conf/patch14-l.json")
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--seq_len", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--platform", default="default")
    main(**vars(p.parse_args()))
