"""Minimal production-style serving daemon: HTTP + dynamic micro-batching.

Usage:
  python -m dct_autoencoder_tpu.tools.serve --model_path out/<run>/model \
      --port 8080 [--max_batch 16] [--batch_timeout_ms 5] [--data_parallel]

Endpoints:
  POST /encode  {"image": [[...]], ...}      -> token record (to_dict schema)
  POST /decode  {record}                     -> {"image": [[...]]}
  POST /reconstruct {"image": ...}           -> {"image": ...}
  POST /generate {"n_tokens", "temperature", "seed", "prefix"?: [tokens],
                  "return_codes"?: bool}     -> {"image", "record"?}
                 (needs --ar_model_path; prefix tokens use the to_dict
                  schema, teacher-forced — class/prefix -> tokens -> image)
  GET  /healthz  -> {"ok", "served", "batches", "queue_depth", "rejected",
                     "expired", "generate"}

Overload behavior: the request queue is BOUNDED (--max_queue; overflow ->
HTTP 429 with Retry-After) and each request carries a deadline
(--request_deadline_s; exceeded -> HTTP 504, expired-in-queue requests are
dropped before costing device time).

Binary codec (production path): send `Content-Type: application/octet-stream`
with an .npy body instead of JSON —
  POST /encode       npy (c,h,w) float32 in [0,1] or uint8  -> record (JSON)
  POST /reconstruct  npy image                              -> npy uint8 (c,h,w)
  POST /decode       JSON record + `Accept: application/octet-stream`
                                                            -> npy uint8 (c,h,w)
A 448px RGB image is ~600 KB as npy uint8 vs ~12 MB as JSON floats; the JSON
codec alone costs seconds of CPU per request on a small host (measured: see
docs/serving_r3.md), so binary is the default for real clients and JSON the
interoperability/demo surface.

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


class QueueFull(Exception):
    """Bounded request queue is full — the HTTP layer answers 429."""


class DeadlineExceeded(Exception):
    """Request passed its deadline before completing — HTTP 504."""


class _Request:
    __slots__ = ("kind", "payload", "event", "result", "error", "deadline")

    def __init__(self, kind: str, payload, deadline: Optional[float] = None):
        self.kind = kind
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None
        self.deadline = deadline  # time.monotonic() timestamp or None

    def group_key(self):
        """Requests sharing a key may ride one pipeline/sampler call."""
        if self.kind == "generate":
            # one batched sampler program per (s, temperature) bucket
            return ("generate", self.payload["n_tokens"], self.payload["temperature"])
        return (self.kind,)


class BatchingServer:
    """Dynamic micro-batcher in front of a DCTPipeline.

    Burst robustness (measured pathology in docs/serving_r3.md: conc-8 p99
    hit 23 s with an unbounded queue): the queue is BOUNDED (max_queue) —
    overflow fails fast with QueueFull (HTTP 429 + Retry-After) instead of
    silently stretching tail latency — and every request carries a deadline;
    the batcher drops requests that expired while queued (HTTP 504) rather
    than spending device time on answers nobody is waiting for."""

    def __init__(
        self,
        pipeline,
        max_batch: int = 16,
        batch_timeout_ms: float = 5.0,
        max_queue: int = 64,
        request_deadline_s: float = 120.0,
        ar_model=None,
    ):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1e3
        self.request_deadline_s = request_deadline_s
        self.ar_model = ar_model  # (ARConfig, params) or None
        self.q: "queue.Queue[_Request]" = queue.Queue(maxsize=max(max_queue, 1))
        self.n_served = 0
        self.n_batches = 0
        self.n_rejected = 0
        self.n_expired = 0
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True, name="batcher")
        self._worker.start()

    # ------------------------------------------------------------- client api

    def submit(self, kind: str, payload, timeout: float = 600.0):
        # timeout stays generous: the FIRST request of a new shape compiles
        # device programs (minutes on remote-compile links), and a request
        # already RUNNING must be allowed to finish — the deadline governs
        # time spent WAITING IN THE QUEUE (enforced by the batcher at
        # dequeue), not in-flight processing, so cold compiles don't get a
        # spurious 504.
        deadline = None
        if self.request_deadline_s and self.request_deadline_s > 0:
            deadline = time.monotonic() + self.request_deadline_s
        req = _Request(kind, payload, deadline)
        try:
            self.q.put_nowait(req)
        except queue.Full:
            self.n_rejected += 1
            raise QueueFull(
                f"request queue full ({self.q.maxsize}); retry later"
            ) from None
        if not req.event.wait(timeout):
            raise DeadlineExceeded(f"request exceeded {timeout:.0f}s client timeout")
        if req.error == "deadline":
            raise DeadlineExceeded("request expired while queued")
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
            # expire requests whose deadline passed while queued: device
            # time on an answer nobody is waiting for only delays the rest
            now = time.monotonic()
            live = []
            for r in batch:
                if r.deadline is not None and now > r.deadline:
                    self.n_expired += 1
                    r.error = "deadline"
                    r.event.set()
                else:
                    live.append(r)
            # group by key; one pipeline/sampler call per group
            by_key = {}
            for r in live:
                by_key.setdefault(r.group_key(), []).append(r)
            for key, reqs in by_key.items():
                try:
                    self._run_group(key[0], reqs)
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
                r.result = im  # np array; the HTTP layer picks the codec
        elif kind in ("reconstruct", "reconstruct_f32"):
            images = [np.asarray(r.payload, dtype=np.float32) for r in reqs]
            # the fused path (2 dispatches for a uniform-size group, no host
            # pull of tokens/patches).  Binary clients ('reconstruct') get
            # uint8 straight off the device — 4x less result transfer, and
            # the binary codec emits uint8 anyway.  JSON clients
            # ('reconstruct_f32', split into their own group by the HTTP
            # layer) keep the full-precision float contract — silently
            # returning 8-bit-quantized floats would move every pixel by up
            # to ~1/510.  Falls back to encode->decode for stub pipelines.
            fn = getattr(self.pipeline, "reconstruct_direct", None)
            if fn:
                outs = fn(images, as_uint8=(kind == "reconstruct"))
            else:
                outs = self.pipeline.reconstruct(images)
            for r, im in zip(reqs, outs):
                r.result = im
        elif kind == "generate":
            self._run_generate(reqs)
        else:
            raise ValueError(f"unknown kind {kind}")
        self.n_served += len(reqs)
        for r in reqs:
            r.event.set()

    def generate_grid(self):
        """(patch_h, patch_w) the /generate layout actually uses: the AR
        model's grid clipped to the tokenizer's (both must embed it)."""
        ar_cfg, _ = self.ar_model
        tok_cfg = self.pipeline.model.config
        return (
            min(ar_cfg.max_patch_h, tok_cfg.max_patch_h),
            min(ar_cfg.max_patch_w, tok_cfg.max_patch_w),
        )

    def generate_max_tokens(self) -> int:
        ph, pw = self.generate_grid()
        return self.ar_model[0].image_channels * ph * pw

    def _run_generate(self, reqs: List[_Request]):
        """AR token generation -> tokenizer decode, micro-batched.

        Every request in the group shares (n_tokens, temperature) — one
        cached batched-scan runner program per bucket (models/ar.py).  Each
        request keeps its own PRNG key (per-row `keys`), so its draw does
        not depend on which batch it landed in, and may carry a token
        PREFIX (to_dict codes schema) that the sampler teacher-forces —
        class/prefix -> tokens -> image (reference decode_gif.py:60-77
        decode contract)."""
        import jax

        from ..models.ar import canonical_layout, sample_codes_scan_batched

        assert self.ar_model is not None, "serve started without --ar_model_path"
        ar_cfg, ar_params = self.ar_model
        tok_cfg = self.pipeline.model.config
        s = reqs[0].payload["n_tokens"]
        temperature = reqs[0].payload["temperature"]
        ph, pw = self.generate_grid()
        # FULL-grid canonical order: each request's layout = its prefix
        # triples first, then the canonical order with those triples REMOVED
        # (a prefix from a real encode record follows a data-dependent
        # importance order; naively overwriting the head would leave the
        # displaced (c,h,w) cells duplicated later in the row — a dense
        # decode scatter then drops coefficients silently)
        full = ar_cfg.image_channels * ph * pw
        c_all, p_all = canonical_layout(ar_cfg, full, patch_h=ph, patch_w=pw)
        c_all, p_all = c_all[0], p_all[0]
        b_real = len(reqs)
        # bucket the batch (1, 2, 4, ... max_batch): every distinct sampler
        # batch size is a compiled program + a pinned KV cache in the LRU
        b = 1
        while b < b_real:
            b *= 2
        b = min(max(b, 1), max(self.max_batch, b_real))
        C = ar_cfg.num_codebooks
        prefix_codes = np.zeros((b, s, C), np.int32)
        prefix_lens = np.zeros((b,), np.int32)
        chans_b = np.zeros((b, s), np.int32)
        poss_b = np.zeros((b, s, 2), np.int32)
        keys = []
        for i in range(b):
            r = reqs[min(i, b_real - 1)]  # pad rows replay the last request
            keys.append(jax.random.PRNGKey(int(r.payload.get("seed", 0))))
            prefix = (r.payload.get("prefix") or [])[:s]
            n = len(prefix)
            used = set()
            for t, tok in enumerate(prefix):
                prefix_codes[i, t] = tok["data"]
                chans_b[i, t] = tok["c"]
                poss_b[i, t] = (tok["h"], tok["w"])
                used.add((int(tok["c"]), int(tok["h"]), int(tok["w"])))
            t = n
            for c, (h, w) in zip(c_all, p_all):
                if t >= s:
                    break
                if (int(c), int(h), int(w)) in used:
                    continue
                chans_b[i, t] = c
                poss_b[i, t] = (h, w)
                t += 1
            prefix_lens[i] = n
        codes = np.asarray(
            sample_codes_scan_batched(
                ar_cfg,
                ar_params,
                np.ascontiguousarray(chans_b),
                np.ascontiguousarray(poss_b),
                rng=None,
                temperature=temperature,
                keys=jax.numpy.stack(keys),
                prefix_codes=prefix_codes,
                prefix_lens=prefix_lens,
            )
        )
        records = []
        for i, r in enumerate(reqs):
            records.append(
                {
                    "size": (ph, pw),
                    "original_size": tuple(
                        r.payload.get(
                            "original_size",
                            (ph * tok_cfg.patch_size, pw * tok_cfg.patch_size),
                        )
                    ),
                    "codes": [
                        {
                            "c": int(chans_b[i, t]),
                            "h": int(poss_b[i, t, 0]),
                            "w": int(poss_b[i, t, 1]),
                            "data": codes[i, t].tolist(),
                        }
                        for t in range(s)
                    ],
                }
            )
        images = self.pipeline.decode(records)
        for r, rec, im in zip(reqs, records, images):
            r.result = {"image": im, "record": rec}


def _decode_npy_image(raw: bytes) -> np.ndarray:
    """npy bytes -> (c, h, w) float32 in [0,1]; uint8 payloads scale by 255."""
    import io

    arr = np.load(io.BytesIO(raw), allow_pickle=False)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    assert arr.ndim == 3, f"expected (c, h, w), got shape {arr.shape}"
    return np.ascontiguousarray(arr, dtype=np.float32)


def _encode_npy_image(im: np.ndarray) -> bytes:
    """(c, h, w) float image in [0,1] (or already-uint8) -> npy uint8 bytes."""
    import io

    buf = io.BytesIO()
    if im.dtype != np.uint8:
        im = (np.clip(im, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    np.save(buf, im)
    return buf.getvalue()


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

        def _npy(self, code: int, arr: np.ndarray):
            body = _encode_npy_image(arr)
            self.send_response(code)
            self.send_header("Content-Type", "application/octet-stream")
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
                        "queue_depth": server.q.qsize(),
                        "queue_max": server.q.maxsize,
                        "rejected": server.n_rejected,
                        "expired": server.n_expired,
                        "generate": server.ar_model is not None,
                    },
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            kind = self.path.strip("/")
            if kind not in ("encode", "decode", "reconstruct", "generate"):
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                binary_in = "octet-stream" in self.headers.get("Content-Type", "")
                binary_out = binary_in or "octet-stream" in self.headers.get("Accept", "")
                if binary_in and kind in ("encode", "reconstruct"):
                    payload = _decode_npy_image(raw)
                else:
                    payload = json.loads(raw) if raw else {}
                    if kind in ("encode", "reconstruct"):
                        payload = payload["image"]
                submit_kind = kind
                if kind == "reconstruct" and not binary_out:
                    submit_kind = "reconstruct_f32"  # float-exact JSON path
                if kind == "generate":
                    if server.ar_model is None:
                        self._json(
                            400, {"error": "no AR model loaded (--ar_model_path)"}
                        )
                        return
                    # bucket the program keys: token counts to multiples of
                    # 64, temperature to 2 decimals — every distinct
                    # (s, temperature, batch) mints a compiled runner
                    # (bounded LRU in models/ar.py, but compiles cost
                    # minutes on remote links)
                    nt = int(payload.get("n_tokens", 256))
                    nt = max(64, ((nt + 63) // 64) * 64)
                    # cap at the grid the layout actually uses (AR grid
                    # clipped to the tokenizer's) or canonical_layout asserts
                    payload["n_tokens"] = min(nt, server.generate_max_tokens())
                    payload["temperature"] = round(
                        float(payload.get("temperature", 1.0)), 2
                    )
                result = server.submit(submit_kind, payload)
                if kind == "generate":
                    im = np.asarray(result["image"])
                    if binary_out:
                        self._npy(200, im)
                        return
                    out = {"image": im.tolist()}
                    if payload.get("return_codes"):
                        out["record"] = result["record"]
                    self._json(200, out)
                    return
                if kind in ("decode", "reconstruct"):
                    if binary_out:
                        self._npy(200, np.asarray(result))
                        return
                    arr = np.asarray(result)
                    if arr.dtype == np.uint8:  # fused uint8 reconstruct path
                        arr = arr.astype(np.float32) / 255.0
                    result = {"image": arr.tolist()}
                self._json(200, result)
            except QueueFull as e:
                self.send_response(429)
                self.send_header("Retry-After", "1")
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except DeadlineExceeded as e:
                self._json(504, {"error": str(e)})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class _Server(ThreadingHTTPServer):
    # default listen backlog (5) resets connections under bursty clients
    request_queue_size = 128


def serve(
    pipeline,
    port: int = 8080,
    max_batch: int = 16,
    batch_timeout_ms: float = 5.0,
    max_queue: int = 64,
    request_deadline_s: float = 120.0,
    ar_model=None,
):
    batcher = BatchingServer(
        pipeline,
        max_batch,
        batch_timeout_ms,
        max_queue=max_queue,
        request_deadline_s=request_deadline_s,
        ar_model=ar_model,
    )
    httpd = _Server(("0.0.0.0", port), make_handler(batcher))
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
    # shape buckets: without them every distinct packed-row count / record
    # token count compiles a fresh device program (minutes on remote links)
    p.add_argument("--pad_rows_to", type=int, default=8)
    p.add_argument("--pad_tokens_to", type=int, default=128)
    # burst robustness: bounded queue (429 + Retry-After on overflow) and a
    # per-request deadline (504; expired-in-queue requests are dropped
    # before they cost device time)
    p.add_argument("--max_queue", type=int, default=64)
    p.add_argument("--request_deadline_s", type=float, default=120.0)
    # AR checkpoint (models/ar.py save_ar_model layout, e.g.
    # out_ar/ar_model from tools/train_ar_example.py): enables /generate
    p.add_argument("--ar_model_path", default=None)
    args = p.parse_args()

    from ..pipeline import DCTPipeline

    pipe = DCTPipeline.from_pretrained(
        args.model_path, sample_patches_beta=args.sample_patches_beta
    )
    pipe.processor.build_attn_mask = False  # the model masks from image ids
    pipe = DCTPipeline(
        pipe.model,
        pipe.processor,
        data_parallel=args.data_parallel,
        pad_rows_to=args.pad_rows_to,
        pad_tokens_to=args.pad_tokens_to,
    )
    ar_model = None
    if args.ar_model_path:
        from ..models.ar import load_ar_model

        ar_model = load_ar_model(args.ar_model_path)
        print(f"AR model loaded from {args.ar_model_path} — /generate enabled")
    httpd = serve(
        pipe,
        args.port,
        args.max_batch,
        args.batch_timeout_ms,
        max_queue=args.max_queue,
        request_deadline_s=args.request_deadline_s,
        ar_model=ar_model,
    )
    print(f"serving on :{args.port} (max_batch={args.max_batch})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
