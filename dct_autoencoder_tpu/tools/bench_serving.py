"""Serving-daemon throughput benchmark: requests/s + p50/p99 latency.

Measures the HTTP daemon (tools/serve.py) end-to-end on-chip across
  * codec: binary npy (production) vs JSON floats (interop/demo),
  * concurrency: 1 / 8 / 64 clients,
  * micro-batching: max_batch=16 w/ 5 ms straggler window vs max_batch=1,
against a trained checkpoint.  One pipeline is shared across server configs
so device programs compile once (shape buckets: pad_rows_to/pad_tokens_to).

Usage:
  python -m dct_autoencoder_tpu.tools.bench_serving \
      --model_path docs/calibrated_run_r3/model [--requests 64]

Emits one JSON line per (server, codec, concurrency) config; results for the
round-3 run are recorded in docs/serving_r3.md.
"""
from __future__ import annotations

import argparse
import http.client
import io
import json
import threading
import time
from typing import Dict, List

import numpy as np


def load_image(path: str, resize: int = 448) -> np.ndarray:
    from ..data.images import load_image_chw

    return load_image_chw(path, resize)


def npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def fire(
    port: int,
    body: bytes,
    headers: Dict[str, str],
    n_requests: int,
    concurrency: int,
    path: str = "/reconstruct",
    retry_429: bool = True,
) -> Dict[str, float]:
    """Fire n_requests at the daemon from `concurrency` threads.

    429 (bounded-queue backpressure) is part of the protocol, not an error:
    the client backs off per Retry-After and retries (retry_429=True, the
    well-behaved client the server's overload contract assumes); rejected
    attempts are counted.  504 (deadline) is counted and NOT retried.
    Latency percentiles are over COMPLETED requests only."""
    lat: List[float] = []
    lock = threading.Lock()
    counter = [0]
    rejected = [0]
    expired = [0]
    errors: List[str] = []

    def worker():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        while True:
            with lock:
                if counter[0] >= n_requests or errors:
                    conn.close()
                    return
                counter[0] += 1
            t0 = time.perf_counter()
            try:
                while True:
                    conn.request("POST", path, body=body, headers=headers)
                    r = conn.getresponse()
                    data = r.read()
                    if r.status == 429 and retry_429:
                        with lock:
                            rejected[0] += 1
                        time.sleep(float(r.headers.get("Retry-After", "1")))
                        continue
                    break
                if r.status == 504:
                    with lock:
                        expired[0] += 1
                    continue
                if r.status != 200:
                    raise RuntimeError(f"{r.status}: {data[:200]}")
            except Exception as e:
                with lock:
                    errors.append(repr(e))
                return
            with lock:
                lat.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError(f"client errors: {errors[:3]}")
    lat.sort()
    out = {
        "requests": len(lat),
        "wall_s": round(wall, 3),
        "req_per_s": round(len(lat) / wall, 3) if lat else 0.0,
        "p50_ms": round(lat[len(lat) // 2] * 1e3, 1) if lat else None,
        "p99_ms": round(lat[min(int(len(lat) * 0.99), len(lat) - 1)] * 1e3, 1) if lat else None,
    }
    if rejected[0]:
        out["rejected_429"] = rejected[0]
    if expired[0]:
        out["expired_504"] = expired[0]
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--image", default="/root/reference/images/baboon.jpg")
    p.add_argument("--resize", type=int, default=448)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--json_requests", type=int, default=16)
    p.add_argument("--sample_patches_beta", type=float, default=0.02)
    # burst-robustness knobs under test (tools/serve.py)
    p.add_argument("--max_queue", type=int, default=64)
    p.add_argument("--request_deadline_s", type=float, default=120.0)
    # AR checkpoint -> also bench /generate (tokens -> image)
    p.add_argument("--ar_model_path", default=None)
    p.add_argument("--gen_tokens", type=int, default=256)
    p.add_argument("--gen_requests", type=int, default=16)
    # 'auto' benches what production serves (the gated int8 form when the
    # checkpoint passed its gate); 'never' benches the fp pipeline for a
    # same-session quantization A/B
    p.add_argument("--prefer_int8", default="auto",
                   choices=("auto", "never", "always"))
    args = p.parse_args()

    from ..pipeline import DCTPipeline
    from .serve import BatchingServer, _Server, make_handler

    base = DCTPipeline.from_pretrained(
        args.model_path, sample_patches_beta=args.sample_patches_beta,
        prefer_int8=args.prefer_int8,
    )
    base.processor.build_attn_mask = False
    pipe = DCTPipeline(base.model, base.processor, pad_rows_to=8, pad_tokens_to=128)

    im = load_image(args.image, args.resize)
    bin_body = npy_bytes((im * 255.0 + 0.5).astype(np.uint8))
    bin_hdr = {"Content-Type": "application/octet-stream"}
    json_body = json.dumps({"image": im.tolist()}).encode()
    json_hdr = {"Content-Type": "application/json"}
    print(f"payload bytes: binary={len(bin_body)} json={len(json_body)}")

    # direct pipeline latency (no HTTP).  reconstruct_direct is the path the
    # daemon actually serves (/reconstruct), so IT is the device-dispatch
    # floor the HTTP p50 should approach; the token-roundtrip reconstruct is
    # printed alongside for the serialization-path comparison.
    for fn_name in ("reconstruct", "reconstruct_direct"):
        fn = getattr(pipe, fn_name)
        for _ in range(2):
            t0 = time.perf_counter()
            fn([im])
            direct = time.perf_counter() - t0
        print(f"direct pipeline.{fn_name}: {direct * 1e3:.0f} ms")

    ar_model = None
    if args.ar_model_path:
        from ..models.ar import load_ar_model

        ar_model = load_ar_model(args.ar_model_path)

    results = []
    for max_batch, timeout_ms, tag in ((16, 5.0, "batched"), (1, 0.0, "unbatched")):
        batcher = BatchingServer(
            pipe, max_batch=max_batch, batch_timeout_ms=timeout_ms,
            max_queue=args.max_queue, request_deadline_s=args.request_deadline_s,
            ar_model=ar_model,
        )
        httpd = _Server(("127.0.0.1", 0), make_handler(batcher))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            # warmup: compile every shape bucket (single + full-batch burst)
            t0 = time.perf_counter()
            fire(port, bin_body, bin_hdr, 1, 1)
            fire(port, bin_body, bin_hdr, 32, 16)
            print(f"[{tag}] warmup {time.perf_counter() - t0:.1f}s", flush=True)

            configs = [("binary", bin_body, bin_hdr, args.requests)]
            if tag == "batched":
                configs.append(("json", json_body, json_hdr, args.json_requests))
            for codec, body, hdr, n in configs:
                for conc in (1, 8, 64):
                    nn = max(n if conc > 1 else min(n, 16), conc)
                    # run twice, keep the steady-state (second) measurement —
                    # the first pass can absorb straggler compiles of shape
                    # buckets the warmup's group sizes didn't hit
                    for attempt in range(2):
                        r = fire(port, body, hdr, nn, conc)
                    b0 = batcher.n_batches
                    line = {"server": tag, "codec": codec, "concurrency": conc,
                            "batches_total": b0, **r}
                    results.append(line)
                    print(json.dumps(line), flush=True)
            if ar_model is not None and tag == "batched":
                gen_body = json.dumps(
                    {"n_tokens": args.gen_tokens, "temperature": 1.0, "seed": 1}
                ).encode()
                # warmup compiles the b=1 and full-batch sampler programs
                fire(port, gen_body, json_hdr, 1, 1, path="/generate")
                fire(port, gen_body, json_hdr, 8, 8, path="/generate")
                for conc in (1, 8):
                    r = fire(
                        port, gen_body, json_hdr,
                        max(args.gen_requests, conc), conc, path="/generate",
                    )
                    line = {"server": tag, "codec": "generate",
                            "n_tokens": args.gen_tokens, "concurrency": conc, **r}
                    results.append(line)
                    print(json.dumps(line), flush=True)
        finally:
            httpd.shutdown()
            batcher.shutdown()
    return results


if __name__ == "__main__":
    main()
