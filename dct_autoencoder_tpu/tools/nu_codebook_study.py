"""nu-codebook error study on REAL Adam moments (committed repro of
docs/opt8bit_nu_codebook_r4.md).

Restores a training-run checkpoint host-side (sharding-free), pulls every
fp32 (mu, nu) Adam-moment pair out of the optimizer state, and measures —
for several candidate 256-level unsigned codebooks — the error each one
induces in the quantity that actually matters: the Adam update direction
``mu / (sqrt(nu) + eps)``.  The round-4 study ran as a /tmp scratch script;
this tool commits the method so the numbers in the doc are reproducible
from the repo alone (VERDICT r4 "documentation integrity" item).

Usage:
    python -m dct_autoencoder_tpu.tools.nu_codebook_study \
        --train_state out_ab_augment/<ts> --out docs/opt8bit_nu_codebook_r4/results.json

`--train_state` accepts either a run out-dir (containing ``train_state/``)
or the orbax directory itself.  Everything runs on host numpy — no TPU, no
jit; a ~6.5M-param checkpoint takes a few seconds.

Candidates (mirroring the round-4 study):
  * ``u4``     — the shipped codebook, ``linspace(0,1,256)**4``
                 (train/opt8bit.py:_unsigned_codebook)
  * ``u2``     — quadratic concentration
  * ``log7``   — 0 + 255 log-spaced levels over 7 decades
  * ``log5``   — 0 + 255 log-spaced levels over 5 decades
  * ``bnbdyn`` — a bitsandbytes-style exponent+fraction dynamic map
                 (log-placed decades, linear fractions inside each decade)
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

BLOCK = 256
EPS = 1e-8


# ---------------------------------------------------------------- codebooks
def cb_u4() -> np.ndarray:
    return np.linspace(0.0, 1.0, 256) ** 4


def cb_u2() -> np.ndarray:
    return np.linspace(0.0, 1.0, 256) ** 2


def cb_log(decades: int) -> np.ndarray:
    return np.concatenate([[0.0], np.logspace(-decades, 0.0, 255)])


def cb_bnbdyn() -> np.ndarray:
    """bitsandbytes-style dynamic map (unsigned): 0, then for each of 7
    decades a linear ramp of fractions — exponent bits buy range, fraction
    bits buy within-decade precision."""
    levels = [0.0]
    n_decades = 7
    # 36 fractions in the first six decades, 39 (incl. the 1.0 endpoint) in
    # the last: 1 + 6*36 + 39 = 256 levels exactly
    counts = [36] * (n_decades - 1) + [39]
    for e, n in enumerate(counts):
        lo, hi = 10.0 ** (e - n_decades), 10.0 ** (e - n_decades + 1)
        last = e == n_decades - 1
        levels.extend(np.linspace(lo, hi, n, endpoint=last))
    return np.asarray(levels)


CANDIDATES = {
    "u4": cb_u4,
    "u2": cb_u2,
    "log7": lambda: cb_log(7),
    "log5": lambda: cb_log(5),
    "bnbdyn": cb_bnbdyn,
}


# ------------------------------------------------------------- quantization
def quant_roundtrip(x: np.ndarray, cb: np.ndarray, block: int = BLOCK) -> np.ndarray:
    """Blockwise absmax-normalize, round to nearest codebook level, dequant."""
    flat = x.reshape(-1).astype(np.float64)
    pad = (-flat.size) % block
    if pad:
        flat = np.pad(flat, (0, pad))
    xb = flat.reshape(-1, block)
    absmax = np.abs(xb).max(axis=1)
    scale = np.where(absmax > 0, absmax, 1.0)
    norm = xb / scale[:, None]
    hi = np.clip(np.searchsorted(cb, norm), 1, cb.size - 1)
    lo = hi - 1
    idx = np.where((cb[hi] - norm) < (norm - cb[lo]), hi, lo)
    deq = cb[idx] * scale[:, None]
    return deq.reshape(-1)[: x.size].reshape(x.shape)


# ------------------------------------------------------------ moment access
def collect_moment_pairs(train_state_dir: str):
    """Host-side restore; yield (name, mu, nu) for every Adam moment pair.

    The saved payload (train/checkpoint.py:29-42) holds opt_state as the
    optax chain tuple; the ScaleByAdamState element carries parallel mu/nu
    trees.  We walk the raw restored pytree and pair leaves by path.
    """
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    # host-side, sharding-free restore: every leaf as a plain np.ndarray
    # (the metadata pass recovers the tree structure without shardings)
    meta = ckptr.metadata(train_state_dir).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    restored = ckptr.restore(
        train_state_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args)
    )
    opt_state = restored["opt_state"]

    def find_adam(node):
        if isinstance(node, dict):
            if "mu" in node and "nu" in node:
                return node
            for v in node.values():
                hit = find_adam(v)
                if hit is not None:
                    return hit
        elif isinstance(node, (list, tuple)):
            for v in node:
                hit = find_adam(v)
                if hit is not None:
                    return hit
        return None

    adam = find_adam(opt_state)
    if adam is None:
        raise SystemExit("no mu/nu trees found in opt_state (8-bit run? this "
                         "study needs an fp32-moment checkpoint)")

    def leaves(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from leaves(v, f"{prefix}/{k}")
        else:
            yield prefix, np.asarray(tree)

    mu = dict(leaves(adam["mu"]))
    nu = dict(leaves(adam["nu"]))
    for name in sorted(mu):
        yield name, mu[name], nu[name]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_state", required=True,
                    help="run out-dir (containing train_state/) or the orbax dir")
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    ts = args.train_state
    if os.path.isdir(os.path.join(ts, "train_state")):
        ts = os.path.join(ts, "train_state")
    ts = os.path.abspath(ts)

    pairs = list(collect_moment_pairs(ts))
    print(f"{len(pairs)} moment tensor pairs from {ts}")

    results = {}
    for cb_name, make in CANDIDATES.items():
        cb = np.sort(make())
        nu_errs, upd_errs = [], []
        for _, mu, nu in pairs:
            mu = mu.astype(np.float64)
            nu = nu.astype(np.float64)
            nu_hat = quant_roundtrip(nu, cb)
            # nu is a second moment: clamp the roundtrip at 0 like the
            # optimizer's sqrt path effectively does
            nu_hat = np.maximum(nu_hat, 0.0)
            upd = mu / (np.sqrt(nu) + EPS)
            upd_hat = mu / (np.sqrt(nu_hat) + EPS)
            denom_nu = np.mean(np.abs(nu)) + 1e-30
            denom_upd = np.mean(np.abs(upd)) + 1e-30
            nu_errs.append(float(np.mean(np.abs(nu_hat - nu)) / denom_nu))
            upd_errs.append(float(np.mean(np.abs(upd_hat - upd)) / denom_upd))
        results[cb_name] = {
            "median_rel_err_nu": float(np.median(nu_errs)),
            "median_update_err": float(np.median(upd_errs)),
            "max_update_err": float(np.max(upd_errs)),
        }
        r = results[cb_name]
        print(f"{cb_name:8s} nu_err={r['median_rel_err_nu']:.4g} "
              f"upd_err={r['median_update_err']:.4g} "
              f"max_upd_err={r['max_update_err']:.4g}")

    payload = {
        "train_state": ts,
        "n_tensor_pairs": len(pairs),
        "block_size": BLOCK,
        "eps": EPS,
        "results": results,
    }
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
