"""Serving daemon tests: HTTP endpoints + dynamic micro-batching."""
import json
import threading
import urllib.request

import numpy as np

from dct_autoencoder_tpu.pipeline import DCTPipeline
from dct_autoencoder_tpu.tools.serve import BatchingServer, serve

from test_model import tiny_config


def make_pipe():
    import jax.numpy as jnp

    return DCTPipeline.from_config(tiny_config("lfq"), sample_patches_beta=0.0, dtype=jnp.float32)


def test_batching_server_roundtrip_and_batches():
    pipe = make_pipe()
    srv = BatchingServer(pipe, max_batch=8, batch_timeout_ms=50.0)
    rng = np.random.default_rng(0)
    ims = [rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32) for _ in range(6)]

    # fire 6 concurrent encodes: the batcher should group them
    results = [None] * 6
    def call(i):
        results[i] = srv.submit("encode", ims[i].tolist())
    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads: t.start()
    for t in threads: t.join()
    assert all(r is not None and "codes" in r for r in results)
    assert srv.n_served == 6
    assert srv.n_batches < 6, "no batching happened"

    # records match the direct pipeline (deterministic at beta=0)
    direct = pipe.encode(ims)
    for got, want in zip(results, direct):
        assert [c["data"] for c in got["codes"]] == [c["data"] for c in want["codes"]]

    # decode roundtrip through the server
    im0 = srv.submit("decode", results[0])
    assert np.asarray(im0).shape == (3, 32, 32)
    srv.shutdown()


def test_http_endpoints():
    pipe = make_pipe()
    httpd = serve(pipe, port=0, max_batch=4, batch_timeout_ms=5.0)  # port 0 = ephemeral
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(1)
        im = rng.uniform(0.1, 0.9, size=(3, 32, 32)).astype(np.float32)

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"]

        body = json.dumps({"image": im.tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            rec = json.loads(r.read())
        assert rec["original_size"] == [32, 32] or rec["original_size"] == (32, 32) or tuple(rec["original_size"]) == (32, 32)
        assert len(rec["codes"]) > 0

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        arr = np.asarray(out["image"])
        assert arr.shape == (3, 32, 32) and np.isfinite(arr).all()
    finally:
        httpd.shutdown()
        httpd.batcher.shutdown()
