"""Hyperparameter sweep runner (reference: wandb_main.py + sweep.yaml).

The reference drives a wandb bayes sweep over learning rate and the four loss
weights, minimizing train rec_loss.  This is a self-contained random-search
counterpart: log-uniform/uniform sampling over the same space, short training
runs, JSONL results, best-trial report.  Plug a different `space` dict or
`--trials` to taste.

Usage:
  python -m dct_autoencoder_tpu.train.sweep \
      --image_dataset_path_or_url 'shards/*.tar' --trials 8 --max_iters 200
"""
from __future__ import annotations

import argparse
import json
import math
import os
import random
from typing import Dict

# reference sweep.yaml: lr log-uniform [1e-5, 4e-4]; weights uniform-ish
DEFAULT_SPACE = {
    "learning_rate": ("log_uniform", 1e-5, 4e-4),
    "rec_loss": ("uniform", 0.0, 1.0),
    "rec_loss_unnormalized": ("uniform", 0.5, 1.5),
    "commit_loss": ("uniform", 0.0, 0.5),
    "entropy_loss": ("uniform", 0.0, 0.5),
}


def sample(space: Dict, rng: random.Random) -> Dict[str, float]:
    out = {}
    for k, (kind, lo, hi) in space.items():
        if kind == "log_uniform":
            out[k] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        else:
            out[k] = rng.uniform(lo, hi)
    return out


def main(
    image_dataset_path_or_url: str = None,
    preprocessed_dataset_path_or_url: str = None,
    model_config_path: str = "./conf/patch14-l.json",
    trials: int = 8,
    max_iters: int = 200,
    batch_size: int = 8,
    seed: int = 0,
    out_file: str = "sweep_results.jsonl",
):
    from .cli import main as train_main

    rng = random.Random(seed)
    best = None
    for t in range(trials):
        params = sample(DEFAULT_SPACE, rng)
        print(f"--- trial {t}: {params}")
        final_metrics = {}

        # capture the last logged rec_loss by wrapping the trainer
        import dct_autoencoder_tpu.train.loop as loop_mod

        orig_train = loop_mod.train

        def capturing_train(*args, log=print, **kwargs):
            def wrap_log(d):
                if isinstance(d, dict) and "rec_loss" in d:
                    final_metrics.update(d)
                log(d)

            return orig_train(*args, log=wrap_log, **kwargs)

        loop_mod.train = capturing_train
        try:
            train_main(
                image_dataset_path_or_url=image_dataset_path_or_url,
                preprocessed_dataset_path_or_url=preprocessed_dataset_path_or_url,
                model_config_path=model_config_path,
                batch_size=batch_size,
                max_iters=max_iters,
                train_norm_iters=2,
                learning_rate=params["learning_rate"],
                rec_loss=params["rec_loss"],
                rec_loss_unnormalized=params["rec_loss_unnormalized"],
                commit_loss=params["commit_loss"],
                entropy_loss=params["entropy_loss"],
                log_every=max(max_iters // 4, 1),
                should_save=False,
                seed=seed + t,
            )
        finally:
            loop_mod.train = orig_train

        record = {"trial": t, **params, **{
            k: v for k, v in final_metrics.items() if isinstance(v, (int, float))
        }}
        with open(out_file, "a") as f:
            f.write(json.dumps(record) + "\n")
        score = record.get("rec_loss", float("inf"))
        if best is None or score < best.get("rec_loss", float("inf")):
            best = record
        print(f"--- trial {t} rec_loss={score}")

    print("best trial:", best)
    return best


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_dataset_path_or_url", default=None)
    p.add_argument("--preprocessed_dataset_path_or_url", default=None)
    p.add_argument("--model_config_path", default="./conf/patch14-l.json")
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--max_iters", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_file", default="sweep_results.jsonl")
    main(**vars(p.parse_args()))
