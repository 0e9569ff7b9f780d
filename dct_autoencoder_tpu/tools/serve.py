"""Minimal production-style serving daemon: HTTP + dynamic micro-batching.

Usage:
  python -m dct_autoencoder_tpu.tools.serve --model_path out/<run>/model \
      --port 8080 [--max_batch 16] [--batch_timeout_ms 5] [--data_parallel]

Endpoints (JSON over HTTP):
  POST /encode  {"image": [[...]], ...}      -> token record (to_dict schema)
  POST /decode  {record}                     -> {"image": [[...]]}
  POST /reconstruct {"image": ...}           -> {"image": ...}
  GET  /healthz                              -> {"ok": true, ...}

Requests are queued and served in dynamic micro-batches: the batcher thread
collects up to max_batch requests (waiting at most batch_timeout_ms for
stragglers) and runs ONE pipeline call per batch — images sharing a shape
ride the same jitted preprocess program, and the packed forward amortizes
dispatch across requests.  Static shapes keep compilation bounded: resize
clients' images to a fixed bucket set for best steady-state behavior.

The reference has no serving story; this is the deployment face of the
DCTPipeline API.  Stdlib-only (ThreadingHTTPServer) — no extra deps.

TPU smoke (448px, trained small-448 checkpoint): first request ~5 min
(remote compiles), steady-state ~6 s/request — dominated by the JSON codec
of the ~12 MB image payload on this 2-vCPU host, not the device (1.13 ms
on-chip; see BENCH_MODE=latency).  Production clients should send uint8 or
a binary codec; the JSON surface is for interoperability/demo.
"""
from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np


class _Request:
    __slots__ = ("kind", "payload", "event", "result", "error")

    def __init__(self, kind: str, payload):
        self.kind = kind
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class BatchingServer:
    """Dynamic micro-batcher in front of a DCTPipeline."""

    def __init__(self, pipeline, max_batch: int = 16, batch_timeout_ms: float = 5.0):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1e3
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.n_served = 0
        self.n_batches = 0
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True, name="batcher")
        self._worker.start()

    # ------------------------------------------------------------- client api

    def submit(self, kind: str, payload, timeout: float = 600.0):
        # generous default: the FIRST request of a new image shape compiles
        # the preprocess/forward programs (minutes on remote-compile links);
        # steady-state requests return in milliseconds
        req = _Request(kind, payload)
        self.q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("request timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def shutdown(self):
        self._stop.set()
        self._worker.join(timeout=10)

    # ---------------------------------------------------------------- batcher

    def _collect(self) -> List[_Request]:
        try:
            first = self.q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.batch_timeout
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            # group by kind; one pipeline call per (kind) group
            by_kind = {}
            for r in batch:
                by_kind.setdefault(r.kind, []).append(r)
            for kind, reqs in by_kind.items():
                try:
                    self._run_group(kind, reqs)
                except Exception as e:  # per-group failure -> fail its requests
                    for r in reqs:
                        r.error = f"{type(e).__name__}: {e}"
                        r.event.set()
            self.n_batches += 1

    def _run_group(self, kind: str, reqs: List[_Request]):
        if kind == "encode":
            images = [np.asarray(r.payload, dtype=np.float32) for r in reqs]
            records = self.pipeline.encode(images)
            for r, rec in zip(reqs, records):
                r.result = rec
        elif kind == "decode":
            images = self.pipeline.decode([r.payload for r in reqs])
            for r, im in zip(reqs, images):
                r.result = im.tolist()
        elif kind == "reconstruct":
            images = [np.asarray(r.payload, dtype=np.float32) for r in reqs]
            outs = self.pipeline.reconstruct(images)
            for r, im in zip(reqs, outs):
                r.result = im.tolist()
        else:
            raise ValueError(f"unknown kind {kind}")
        self.n_served += len(reqs)
        for r in reqs:
            r.event.set()


def make_handler(server: BatchingServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(
                    200,
                    {
                        "ok": True,
                        "served": server.n_served,
                        "batches": server.n_batches,
                    },
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            kind = self.path.strip("/")
            if kind not in ("encode", "decode", "reconstruct"):
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n))
                if kind in ("encode", "reconstruct"):
                    payload = payload["image"]
                result = server.submit(kind, payload)
                if kind in ("decode", "reconstruct"):
                    result = {"image": result}
                self._json(200, result)
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(pipeline, port: int = 8080, max_batch: int = 16, batch_timeout_ms: float = 5.0):
    batcher = BatchingServer(pipeline, max_batch, batch_timeout_ms)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(batcher))
    httpd.batcher = batcher  # for tests / introspection
    return httpd


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--batch_timeout_ms", type=float, default=5.0)
    p.add_argument("--sample_patches_beta", type=float, default=0.02)
    p.add_argument("--data_parallel", action="store_true")
    args = p.parse_args()

    from ..pipeline import DCTPipeline

    pipe = DCTPipeline.from_pretrained(
        args.model_path, sample_patches_beta=args.sample_patches_beta
    )
    if args.data_parallel:
        pipe = DCTPipeline(pipe.model, pipe.processor, data_parallel=True)
    httpd = serve(pipe, args.port, args.max_batch, args.batch_timeout_ms)
    print(f"serving on :{args.port} (max_batch={args.max_batch})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
