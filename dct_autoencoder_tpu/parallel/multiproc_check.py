"""Two-process full-train-step verification.

The strongest multi-host evidence a single machine permits: mirrors the
reference's Accelerate DDP whole-step training across REAL process
boundaries (reference main.py:429-434, 239).  Two OS processes form a
jax.distributed cluster (one CPU device each — the topology of a 2-host TPU
slice), assemble a GLOBAL packed batch from per-process local row shards via
`jax.make_array_from_process_local_data`, run the SAME jitted train step the
single-process trainer uses, and check that

  * loss and grad_norm match the single-process result (gradient
    all-reduce across the process boundary is correct), and
  * a dp-sharded encode emits per-row token streams identical to the
    single-process encode (each process checks the rows it owns).

Used by tests/test_multihost.py and by __graft_entry__.dryrun_multichip
(MULTICHIP_r03 report line).

Parent/worker split: `run_two_process_check` builds a payload (config,
params, calibrated patchnorm, packed batch, single-process expectations),
spawns two workers running this module's __main__, and validates their
output.  Workers must start from a clean JAX runtime, hence real
subprocesses rather than threads.
"""
from __future__ import annotations

import os
import pickle
import socket
import subprocess
import sys
from typing import Dict

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _tiny_config():
    from ..models.config import DCTAutoencoderConfig, TransformerConfig

    tc = TransformerConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
    )
    return DCTAutoencoderConfig(
        image_channels=3,
        patch_size=4,
        max_patch_h=8,
        max_patch_w=8,
        vq_codebook_size=64,
        vq_num_codebooks=4,
        vq_type="lfq",
        encoder_config=tc,
        decoder_config=tc,
    )


_BATCH_LEAVES = (
    "patches",
    "key_pad_mask",
    "batched_image_ids",
    "patch_channels",
    "patch_positions",
)


def build_payload(payload_path: str) -> Dict[str, float]:
    """Single-process reference run; pickles everything the workers need."""
    import jax

    from ..models.factory import get_model_and_processor
    from ..models.patchnorm import calibrate_patchnorm_batch
    from ..train.loop import (
        TrainState,
        make_optimizer,
        make_train_step,
        prepare_train_batch,
    )

    cfg = _tiny_config()
    model, proc = get_model_and_processor(cfg, sample_patches_beta=0.0)
    rng = np.random.default_rng(0)
    ims = [
        rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(4)
    ]
    ds = [proc.preprocess(im) for im in ims]
    cols = {k: [d[k] for d in ds] for k in ds[0]}
    batch = next(proc.iter_batches(iter([cols]), batch_size=None))
    model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
    sb, _ = prepare_train_batch(batch)
    assert sb.patches.shape[0] % 2 == 0, "need an even row count to split 2-way"

    tx = make_optimizer(learning_rate=1e-3, max_iters=10, warmup_steps=0)
    step = jax.jit(make_train_step(model.module, tx))
    state = TrainState.create(model.params, tx)
    _, metrics = step(state, model.patchnorm, sb)

    def fwd(params, b):
        return model.module.apply({"params": params}, b, training=False)["codes"]

    codes = np.asarray(jax.jit(fwd)(model.params, sb))
    expected = {
        "loss": float(metrics["loss"]),
        "grad_norm": float(metrics["grad_norm"]),
    }
    payload = {
        "config": cfg,
        "params": jax.tree_util.tree_map(np.asarray, model.params),
        "patchnorm": {
            "n": np.asarray(model.patchnorm.n),
            "median": np.asarray(model.patchnorm.median),
            "b": np.asarray(model.patchnorm.b),
        },
        "batch": {k: np.asarray(getattr(sb, k)) for k in _BATCH_LEAVES},
        "codes": codes,
        **expected,
    }
    with open(payload_path, "wb") as f:
        pickle.dump(payload, f)
    return expected


def worker_main(payload_path: str, coordinator: str, pid: int, nprocs: int = 2):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs, jax.process_count()
    devices = jax.devices()
    assert len(devices) == nprocs, devices

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..models.autoencoder import DCTAutoencoderModule
    from ..models.patchnorm import PatchNormState
    from ..patches.container import DCTPatches
    from ..train.loop import TrainState, make_optimizer, make_train_step

    with open(payload_path, "rb") as f:
        payload = pickle.load(f)

    module = DCTAutoencoderModule(payload["config"])
    patchnorm = PatchNormState(
        n=jnp.asarray(payload["patchnorm"]["n"]),
        median=jnp.asarray(payload["patchnorm"]["median"]),
        b=jnp.asarray(payload["patchnorm"]["b"]),
    )
    mesh = Mesh(np.asarray(devices).reshape(nprocs), ("data",))
    rows = NamedSharding(mesh, P("data"))

    # global batch from per-process local shards: process p owns its half
    # of the packed rows (the multi-host input-pipeline ownership model)
    b = payload["batch"]["patches"].shape[0]
    mb = b // nprocs
    lo, hi = pid * mb, (pid + 1) * mb

    def to_global(x):
        return jax.make_array_from_process_local_data(rows, x[lo:hi], x.shape)

    batch = DCTPatches(
        attn_mask=None,
        **{k: to_global(payload["batch"][k]) for k in _BATCH_LEAVES},
    )

    tx = make_optimizer(learning_rate=1e-3, max_iters=10, warmup_steps=0)
    step = jax.jit(make_train_step(module, tx))
    state = TrainState.create(payload["params"], tx)
    with mesh:
        _, metrics = step(state, patchnorm, batch)
    loss = float(metrics["loss"])
    grad_norm = float(metrics["grad_norm"])
    assert np.isfinite(loss) and np.isfinite(grad_norm)
    # gradient/loss all-reduce across the process boundary must reproduce
    # the single-process numbers (summation-order tolerance only)
    np.testing.assert_allclose(loss, payload["loss"], rtol=2e-4)
    np.testing.assert_allclose(grad_norm, payload["grad_norm"], rtol=2e-3)

    # dp-sharded encode: each process checks the token rows it owns
    def fwd(params, bb):
        return module.apply({"params": params}, bb, training=False)["codes"]

    with mesh:
        codes = jax.jit(fwd)(payload["params"], batch)
    local = sorted(codes.addressable_shards, key=lambda s: s.index[0].start or 0)
    got = np.concatenate([np.asarray(s.data) for s in local], axis=0)
    np.testing.assert_array_equal(got, payload["codes"][lo:hi])

    print(
        f"proc {pid} full-step ok loss={loss:.6f} grad_norm={grad_norm:.4f} "
        f"encode rows {lo}:{hi} identical",
        flush=True,
    )


def run_two_process_check(tmpdir: str, timeout: float = 420.0) -> Dict:
    """Parent side: build payload, spawn 2 workers, validate their output.

    Returns {'loss', 'grad_norm', 'outputs': [stdout0, stdout1]}; raises on
    any worker failure.
    """
    payload_path = os.path.join(tmpdir, "multiproc_payload.pkl")
    expected = build_payload(payload_path)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""  # one real cpu device per process, no fake pod
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "dct_autoencoder_tpu.parallel.multiproc_check",
                payload_path,
                coordinator,
                str(pid),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"proc {pid} full-step ok" not in out:
            raise RuntimeError(f"2-process worker {pid} failed:\n{out}")
    return {**expected, "outputs": outs}


if __name__ == "__main__":
    worker_main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
