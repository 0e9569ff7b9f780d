"""High-level tokenizer pipeline: images <-> LFQ token records in one call.

The reference scatters this flow across scripts (testpipe.py,
prepare_autoregressive_dataset.py, decode_gif.py); here it is the serving API:

    pipe = DCTPipeline.from_pretrained("out/<ts>/model")
    records = pipe.encode(images)        # JSON-able per-image token records
    recons  = pipe.decode(records)       # RGB arrays at original sizes

Encoding uses the batched preprocessing path (one vmapped program per image
shape) + packing + the jitted model forward; decoding rebuilds packed batches
from records and runs decode_from_codes.  Everything static-shape on device.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .models.autoencoder import DCTAutoencoder
from .models.config import DCTAutoencoderConfig
from .models.factory import get_model_and_processor
from .patches.container import from_dict, to_dict
from .patches.extractor import DCTAutoencoderFeatureExtractor


class DCTPipeline:
    def __init__(
        self,
        model: DCTAutoencoder,
        processor: DCTAutoencoderFeatureExtractor,
        data_parallel: bool = False,
        pad_rows_to: int = 0,
        pad_tokens_to: int = 0,
    ):
        """data_parallel=True shards encode batches row-wise over every
        visible device (BASELINE configs 4-5 serving layout): packed rows
        are padded to the device count and the jitted forward runs with a
        (data,) mesh sharding — XLA splits the batch, no collectives needed
        in eval. Token records are identical to single-device encode
        (tests/test_parallel.py::test_sharded_encode_matches_single_device).

        pad_rows_to / pad_tokens_to bucket device shapes for SERVING: encode
        pads packed rows to a multiple (fully-masked rows), decode pads each
        record's token count to a multiple (masked tokens).  Without them,
        every distinct packed-row count / per-image token count compiles a
        fresh program — fatal for a daemon on remote-compile links where one
        compile costs minutes.  Padding is mask-transparent: records and
        reconstructions are bit-identical to the unpadded path
        (tests/test_serve.py::test_pipeline_shape_bucketing).
        """
        self.model = model
        self.processor = processor
        self.pad_rows_to = pad_rows_to
        self.pad_tokens_to = pad_tokens_to
        self._fused_roundtrip = None
        self._fused_reconstruct_cache = {}
        self._mesh = None
        self._dp_forward = None
        if data_parallel:
            import jax

            from .parallel.mesh import batch_sharding, make_mesh, replicated

            self._mesh = make_mesh(n_model=1)
            rep = replicated(self._mesh)
            bsh = batch_sharding(self._mesh)
            module = model.module

            def fwd(params, vq_stats, batch):
                return module.apply(
                    {"params": params, "vq_stats": vq_stats}, batch, training=False
                )

            self._dp_forward = jax.jit(fwd, in_shardings=(rep, rep, bsh))

    def _forward(self, nb):
        """Jitted eval forward, optionally data-parallel over the mesh."""
        if self._mesh is None:
            return self.model.forward(nb, training=False)
        import jax

        from .parallel.mesh import pad_batch_rows, shard_batch
        from .train.loop import prepare_train_batch

        b = nb.patches.shape[0]
        meta = dict(
            patch_sizes=nb.patch_sizes, original_sizes=nb.original_sizes
        )
        stripped, _ = prepare_train_batch(nb)
        padded = pad_batch_rows(stripped, self._mesh.shape["data"])
        with self._mesh:
            out = self._dp_forward(
                self.model.params, self.model.vq_stats, shard_batch(padded, self._mesh)
            )
        trim = jax.tree_util.tree_map(lambda x: x[:b], out["dct_patches"])
        out["dct_patches"] = trim.replace(**meta)
        out["codes"] = out["codes"][:b]
        return out

    @classmethod
    def from_pretrained(
        cls,
        path: str,
        sample_patches_beta: float = 0.02,
        dtype=None,
        prefer_int8: str = "auto",
    ):
        """Load a checkpoint for serving.

        prefer_int8='auto' (default) consumes the recorded int8 gate
        decision: if `int8_serving.json` exists in the checkpoint dir
        (written by tools/quantize_checkpoint --gate when token agreement
        cleared the threshold) and says pass, the gated int8 sibling is
        loaded instead — the serving default flips to int8 per checkpoint,
        only when that checkpoint earned it.  'never' ignores the record;
        'always' requires a passing record and errors otherwise."""
        import json as _json
        import os as _os

        import jax.numpy as jnp

        assert prefer_int8 in ("auto", "never", "always"), prefer_int8
        load_path = path
        if prefer_int8 != "never":
            gate_file = _os.path.join(path, "int8_serving.json")
            record = None
            if _os.path.exists(gate_file):
                with open(gate_file) as f:
                    record = _json.load(f)
            int8_dir = None
            if record is not None and record.get("pass"):
                # absolute pointer first, then relative to the checkpoint
                # dir (survives copying the tree to another host)
                for cand in (
                    record.get("int8_model", ""),
                    _os.path.join(path, record.get("int8_model_rel", "")),
                ):
                    if cand and _os.path.isdir(cand):
                        int8_dir = cand
                        break
            if int8_dir:
                load_path = int8_dir
                crit = (
                    f"agreement {record['agreement']:.4f} >= "
                    f"{record['threshold']}"
                    if "threshold" in record
                    # relative gate (quantize_checkpoint --gate_mode
                    # relative): flip-floor ratio + psnr delta criteria
                    else f"flip ratio {record.get('flip_ratio')} <= "
                    f"{record.get('flip_ratio_max')}, psnr delta "
                    f"{record.get('psnr_delta')}"
                )
                print(f"serving int8 form (gated: {crit}): {load_path}")
            elif prefer_int8 == "always":
                raise FileNotFoundError(
                    f"prefer_int8='always' but no passing int8 gate record at "
                    f"{gate_file} (run tools/quantize_checkpoint --gate)"
                )
        model, proc = get_model_and_processor(
            None,
            dtype=dtype or jnp.bfloat16,
            sample_patches_beta=sample_patches_beta,
            resume_path=load_path,
        )
        return cls(model, proc)

    @classmethod
    def from_config(
        cls,
        config: DCTAutoencoderConfig,
        sample_patches_beta: float = 0.02,
        dtype=None,
        seed: int = 0,
    ):
        import jax.numpy as jnp

        model, proc = get_model_and_processor(
            config,
            dtype=dtype or jnp.bfloat16,
            sample_patches_beta=sample_patches_beta,
            seed=seed,
        )
        return cls(model, proc)

    # ------------------------------------------------------------------ api

    def encode(self, images: Sequence[np.ndarray], batch_size: Optional[int] = None) -> List[dict]:
        """RGB images ((c, h, w) float in [0,1]) -> per-image token records.

        Records follow the reference token-dump schema (dct_patches.to_dict):
        {"size", "original_size", "codes": [{"c","h","w","data"}]}.
        """
        ds = self.processor.preprocess_many(images)
        cols = {k: [d[k] for d in ds] for k in ds[0]}
        records: List[dict] = []
        for batch in self.processor.iter_batches(
            iter([cols]), batch_size=batch_size, drain=batch_size is not None
        ):
            # strip the recompile-trap static aux before any jitted call
            # (one authoritative strip: train.loop.prepare_train_batch) —
            # left on the batch it keys the compile cache and a daemon
            # recompiles per image-size/count combination
            meta = dict(
                patch_sizes=batch.patch_sizes, original_sizes=batch.original_sizes
            )
            from .train.loop import prepare_train_batch

            batch, _ = prepare_train_batch(batch)
            if self.pad_rows_to:
                from .parallel.mesh import pad_batch_rows

                # (the (b,1,s,s) mask was dropped above: the model derives
                # masking from ids, and row-padding it is a multi-MB host copy)
                batch = pad_batch_rows(batch, self.pad_rows_to)
            nb = self.model.normalize_(batch)
            out = self._forward(nb)
            records.extend(to_dict(out["dct_patches"].replace(**meta), out["codes"]))
        return records

    def decode(self, records: Sequence[dict]) -> List[np.ndarray]:
        """Token records -> RGB images at their original sizes."""
        import jax.numpy as jnp

        images: List[np.ndarray] = []
        for rec in records:
            dp, codes = from_dict(rec)
            # bucket the token count so a serving daemon does not compile a
            # fresh decode program per distinct record length (masked pad
            # tokens land in revert_patching's trash slot)
            n = codes.shape[0]
            padn = (-n) % self.pad_tokens_to if self.pad_tokens_to else 0
            if padn:
                codes = np.concatenate(
                    [codes, np.zeros((padn, codes.shape[1]), codes.dtype)]
                )
                pad1 = lambda x, fill: jnp.pad(
                    x, ((0, 0), (0, padn)), constant_values=fill
                )
                dp = dp.replace(
                    key_pad_mask=pad1(dp.key_pad_mask, True),
                    attn_mask=None,
                    batched_image_ids=pad1(dp.batched_image_ids, 0),
                    patch_channels=pad1(dp.patch_channels, 0),
                    patch_positions=jnp.pad(
                        dp.patch_positions, ((0, 0), (0, padn), (0, 0))
                    ),
                )
            # static size aux stays OFF the jitted decode/inv-normalize calls
            # (same recompile trap as encode); the mask is always dropped —
            # the model derives it from ids, and from_dict's materialized
            # (1,1,n,n) ones would otherwise ship n^2 bools per request
            decoded = self.model.decode_from_codes(
                codes[None],
                key_pad_mask=dp.key_pad_mask,
                attn_mask=None,
                batched_image_ids=dp.batched_image_ids,
                patch_channels=dp.patch_channels,
                patch_positions=dp.patch_positions,
            )
            decoded = self.model.inv_normalize_(decoded)
            decoded = decoded.replace(
                patch_sizes=dp.patch_sizes, original_sizes=dp.original_sizes
            )
            images.append(np.clip(self.processor.postprocess(decoded)[0], 0.0, 1.0))
        return images

    def reconstruct(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        """encode + decode in one step (keeps original image order)."""
        return self.decode(self.encode(images))

    def reconstruct_direct(
        self, images: Sequence[np.ndarray], as_uint8: bool = False
    ) -> List[np.ndarray]:
        """Latency-path reconstruct: no token-record roundtrip.

        Uniform-size groups (THE serving case — clients resize to a bucket)
        run normalize -> forward (quantize + decode) -> inverse-normalize ->
        in-jit scatter-unpatch -> IDCT -> RGB as ONE jitted program: 2 device
        dispatches per call (preprocess, everything-else) vs reconstruct()'s
        ~6, no host pull of the token stream OR the patch tensor, and with
        as_uint8=True the only device->host transfer is the final uint8
        image (4x smaller than f32 — the serving daemon's binary codec emits
        uint8 anyway).  Mixed-size groups fall back to a 3-dispatch path
        (fused roundtrip + host unpatch + per-size postprocess).

        Semantically identical to reconstruct() — the forward decodes from
        the same quantized codes, they are just not serialized — and exact to
        1e-5 on CPU (tests/test_serve.py::test_reconstruct_direct_matches).
        On TPU the paths compile as different programs, so bf16 fusion order
        differs and agreement is at rounding level (>40 dB PSNR between
        paths at 448px, measured).  Used by the daemon's /reconstruct.
        """
        import jax

        from .models.patchnorm import apply_patchnorm, inverse_patchnorm

        ds = self.processor.preprocess_many(images)
        cols = {k: [d[k] for d in ds] for k in ds[0]}
        outs: List[np.ndarray] = []
        for batch in self.processor.iter_batches(iter([cols]), batch_size=None):
            meta = dict(
                patch_sizes=batch.patch_sizes, original_sizes=batch.original_sizes
            )
            # strip the recompile-trap static aux (one authoritative strip:
            # train.loop.prepare_train_batch); the fused path bakes sizes in
            # as static ints, the fallback re-attaches `meta`.
            from .train.loop import prepare_train_batch

            dev, _ = prepare_train_batch(batch)
            # rows must divide BOTH the serving bucket and (data-parallel)
            # the data-axis size — the fused program pins batch_sharding
            row_mult = max(self.pad_rows_to, 1)
            if self._mesh is not None:
                import math

                row_mult = math.lcm(row_mult, self._mesh.shape["data"])
            if row_mult > 1:
                from .parallel.mesh import pad_batch_rows

                dev = pad_batch_rows(dev, row_mult)

            n_images = len(meta["patch_sizes"])
            if (
                len(set(meta["patch_sizes"])) == 1
                and len(set(meta["original_sizes"])) == 1
            ):
                # bucket the canvas slot count to the next power of two: the
                # slot count is a STATIC dim of the fused program, and a
                # micro-batching daemon sees every group size 1..max_batch —
                # unbucketed that is one straggler compile per size (empty
                # slots cost only the IDCT of a zero canvas + a slightly
                # larger pull, and the host slices them off)
                bucket = 1 << (n_images - 1).bit_length()
                fn = self._fused_reconstruct_fn(
                    meta["patch_sizes"][0], meta["original_sizes"][0],
                    bucket, as_uint8,
                )
                imgs = np.asarray(
                    fn(self.model.params, self.model.vq_stats,
                       self.model.patchnorm, dev)
                )
                outs.extend(imgs[i] for i in range(n_images))
                continue

            # mixed sizes: fused roundtrip + host unpatch + postprocess
            if self._fused_roundtrip is None:
                module = self.model.module

                def roundtrip(params, vq_stats, patchnorm, b):
                    normalized = b.replace(patches=apply_patchnorm(patchnorm, b))
                    out = module.apply(
                        {"params": params, "vq_stats": vq_stats},
                        normalized, training=False,
                    )
                    return inverse_patchnorm(patchnorm, out["dct_patches"])

                self._fused_roundtrip = jax.jit(roundtrip)
            patches = self._fused_roundtrip(
                self.model.params, self.model.vq_stats, self.model.patchnorm, dev
            )
            rec = dev.replace(patches=patches, **meta)
            for im in self.processor.postprocess(rec):
                im = np.clip(im, 0.0, 1.0)
                if as_uint8:
                    im = (im * 255.0 + 0.5).astype(np.uint8)
                outs.append(im)
        return outs

    def _fused_reconstruct_fn(self, grid, orig, max_images: int, as_uint8: bool):
        """One jitted program: normalize -> forward -> inv-normalize ->
        scatter-unpatch -> (pad+)IDCT -> IPT->RGB [-> uint8] for a uniform
        (grid, original_size) group with `max_images` canvas slots (callers
        bucket the slot count).  Cached per (grid, orig, max_images,
        as_uint8) — with client-side size bucketing + pow2 slot buckets that
        is a small, bounded program set."""
        key = (tuple(grid), tuple(orig), max_images, as_uint8)
        if key in self._fused_reconstruct_cache:
            return self._fused_reconstruct_cache[key]
        import jax
        import jax.numpy as jnp

        from .models.patchnorm import apply_patchnorm, inverse_patchnorm
        from .ops.colorspace import ipt_to_rgb
        from .ops.dct import idct2
        from .train.pixel_loss import row_image_layout, unpatch_to_planes

        module = self.model.module
        p = self.processor.patch_size
        c = self.processor.channels
        (ph, pw), (h, w) = key[0], key[1]
        assert ph * p <= h and pw * p <= w, (grid, orig, p)
        use_fused_kernel = self.processor._use_fused_pallas(h, w)

        def fn(params, vq_stats, patchnorm, b):
            normalized = b.replace(patches=apply_patchnorm(patchnorm, b))
            out = module.apply(
                {"params": params, "vq_stats": vq_stats}, normalized, training=False
            )
            patches = inverse_patchnorm(patchnorm, out["dct_patches"])
            offsets, _ = row_image_layout(b)
            planes = unpatch_to_planes(
                patches, b, offsets, (ph, pw), p, c, max_images
            )
            if use_fused_kernel:
                from .kernels.idct_unpatchify import fused_idct_unpatchify_rgb

                rgb = fused_idct_unpatchify_rgb(planes, h, w)
            else:
                canvas = jnp.zeros((max_images, c, h, w), jnp.float32)
                canvas = canvas.at[:, :, : ph * p, : pw * p].set(planes)
                rgb = ipt_to_rgb(idct2(canvas))
            rgb = jnp.clip(rgb, 0.0, 1.0)
            if as_uint8:
                rgb = (rgb * 255.0 + 0.5).astype(jnp.uint8)
            return rgb

        if self._mesh is not None:
            # data-parallel serving: packed rows ride the data axis, images
            # come back replicated (XLA inserts the gather after the scatter)
            from .parallel.mesh import batch_sharding, replicated

            rep = replicated(self._mesh)
            jitted = jax.jit(
                fn,
                in_shardings=(rep, rep, rep, batch_sharding(self._mesh)),
                out_shardings=rep,
            )
        else:
            jitted = jax.jit(fn)
        self._fused_reconstruct_cache[key] = jitted
        return self._fused_reconstruct_cache[key]
