"""Prefetch iterator tests."""
import time

import numpy as np
import pytest

from dct_autoencoder_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_items():
    src = list(range(57))
    assert list(prefetch(iter(src), buffer_size=4)) == src


def test_prefetch_propagates_exceptions():
    def bad():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(bad(), buffer_size=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_overlaps_production():
    """Consumer that sleeps should find the next item already produced.

    Wall-clock bounds are noisy on 2 vCPUs (CLAUDE.md), so retry: serial
    execution takes >= 0.5s by construction, overlap ~0.3s — pass if ANY
    attempt lands clearly under the serial floor."""
    def slow_source():
        for i in range(5):
            time.sleep(0.05)
            yield i

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = []
        for x in prefetch(slow_source(), buffer_size=2):
            time.sleep(0.05)  # consumer work overlapping producer work
            out.append(x)
        best = min(best, time.time() - t0)
        assert out == list(range(5))
        if best < 0.45:
            break
    assert best < 0.45, best


def test_train_loop_with_prefetch():
    from dct_autoencoder_tpu.train.loop import train
    from test_train import setup_model

    model, proc, _ = setup_model()
    rng = np.random.default_rng(21)

    def data_iter():
        for _ in range(3):
            ims = [rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(3)]
            ds = [proc.preprocess(im) for im in ims]
            yield {k: [d[k] for d in ds] for k in ds[0]}

    logs = []
    train(
        model, proc, data_iter(), batch_size=None, max_iters=3,
        learning_rate=1e-4, prefetch_batches=2, log_every=1, save_every=0,
        log=lambda d: logs.append(d) if isinstance(d, dict) else None,
    )
    assert any("loss" in d for d in logs)
