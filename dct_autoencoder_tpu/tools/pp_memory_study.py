"""Pipeline-schedule memory study: GPipe-autodiff vs in-program 1F1B.

Compiles both schedules on the virtual 8-device CPU mesh and reads XLA's own
`memory_analysis()` (temp = activations/workspace, the quantity the schedule
controls; argument/output bytes are layout-identical between the two).  The
microbatch SIZE is held fixed while the microbatch COUNT M grows, so the
expected scaling is visible directly: GPipe's backward keeps every
microbatch's saved activations live (temp ~ O(M)), 1F1B's combined scan
keeps at most the 2S-slot residual ring (temp ~ O(S), flat in M).

Committed version of the round-4 local-scratch `pp_memory_study.py`
(docs/parallelism.md) extended with the 1F1B column.  XLA:CPU numbers are
indicative, not chip-exact — same caveat as the round-4 table.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m dct_autoencoder_tpu.tools.pp_memory_study --out results.json
"""
from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n_model", type=int, default=2)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--micro_rows", type=int, default=8, help="rows per microbatch per data shard")
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--microbatches", type=int, nargs="+", default=[2, 4, 8, 16])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dct_autoencoder_tpu.parallel.mesh import make_mesh
    from dct_autoencoder_tpu.parallel.pipeline import (
        PipelineSpec,
        pipeline_stack_apply,
    )
    from dct_autoencoder_tpu.parallel.pipeline_1f1b import (
        pipeline_1f1b_loss_and_grad,
    )

    mesh = make_mesh(n_model=args.n_model)
    n_data = mesh.shape["data"]
    L, s, d = args.layers, args.seq, args.dim
    rng = np.random.default_rng(0)
    stacked = {
        "w": jnp.asarray(rng.standard_normal((L, d, d)).astype(np.float32) * 0.2),
        "b": jnp.zeros((L, d), jnp.float32),
    }

    def layer_apply(p, xm, ids_m, pad_m):
        gate = (~pad_m)[..., None].astype(xm.dtype)
        return jnp.tanh(xm @ p["w"] + p["b"]) * gate

    def loss_fn(y, ids_m, pad_m):
        return jnp.mean(y**2)

    rows_out = []
    for M in args.microbatches:
        b = n_data * M * args.micro_rows  # fixed microbatch size, growing batch
        x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
        ids = jnp.zeros((b, s), jnp.int32)
        pad = jnp.zeros((b, s), bool)
        spec = PipelineSpec(mesh=mesh, n_microbatches=M)

        def gpipe_loss(p, x):
            y = pipeline_stack_apply(layer_apply, p, x, ids, pad, spec)
            # mean over the same (n_data*M) chunks the 1F1B loss uses
            return jnp.mean(
                jax.vmap(lambda c: loss_fn(c, None, None))(
                    y.reshape(n_data * M, -1, s, d)
                )
            )

        with mesh:
            mg = (
                jax.jit(jax.grad(gpipe_loss))
                .lower(stacked, x)
                .compile()
                .memory_analysis()
            )
            m1 = (
                jax.jit(
                    lambda p, x: pipeline_1f1b_loss_and_grad(
                        layer_apply, loss_fn, p, x, ids, pad, spec
                    )
                )
                .lower(stacked, x)
                .compile()
                .memory_analysis()
            )
        row = {
            "M": M,
            "batch_rows": b,
            "gpipe_temp_mb": round(mg.temp_size_in_bytes / 2**20, 1),
            "f1b_temp_mb": round(m1.temp_size_in_bytes / 2**20, 1),
            "gpipe_arg_mb": round(mg.argument_size_in_bytes / 2**20, 1),
            "f1b_arg_mb": round(m1.argument_size_in_bytes / 2**20, 1),
        }
        rows_out.append(row)
        print(json.dumps(row), flush=True)

    payload = {
        "mesh": {"data": n_data, "model": args.n_model},
        "shape": {"layers": L, "seq": s, "dim": d, "micro_rows": args.micro_rows},
        "backend": "cpu-virtual (indicative, not chip-exact)",
        "rows": rows_out,
    }
    if args.out:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
