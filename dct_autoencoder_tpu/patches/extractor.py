"""Feature extraction: RGB image -> packed DCT patch token batches, and back.

TPU-first re-design of the reference extractor
(reference: dct_autoencoder/feature_extraction_dct_autoencoder.py).  Design
notes on how this diverges from the reference implementation:

* The whole-image DCT runs ON DEVICE as MXU matmuls (ops/dct.py).  The
  reference is forced onto the CPU by a cuFFT memory leak
  (feature_extraction...py:138-141); that workaround is obsolete here.
* Per-image preprocessing (IPT + DCT + patchify + importance sort) is one
  jitted function cached per image shape; only the final `[:k]` truncation
  (data-dependent token budget) happens on host, on the already-sorted
  prefix.
* `revert_patching` is a single vectorized scatter into dense per-image
  canvases instead of the reference's per-token Python loop
  (feature_extraction...py:639-643).
* Sequence packing stays host-side (see packing.py) and produces static
  `(b, max_seq_len)` batches, which is what XLA wants.
"""
from __future__ import annotations

import math
import random as _random
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.colorspace import ipt_to_rgb, rgb_to_ipt
from ..ops.dct import dct2, idct2
from .container import DCTPatches
from .packing import GroupPatchesState, batch_groups, group_patches_by_max_seq_len


def exp_trunc_dist(beta: float, rng: Optional[_random.Random] = None) -> float:
    """Exponential draw used for the stochastic token budget (util.py:167-172)."""
    r = rng if rng is not None else _random
    x = r.random()
    return -1.0 / beta * math.log(x)


class DCTAutoencoderFeatureExtractor:
    """Image <-> packed DCT token pipeline.

    Parameters mirror the reference extractor (feature_extraction...py:108-127):
    channel_importances defaults to (8, 1, 1) (intensity-heavy) and the patch
    magnitude contributes with weight 0.1 to the importance score.
    """

    def __init__(
        self,
        channels: int,
        patch_size: int,
        sample_patches_beta: float,
        max_patch_h: int,
        max_patch_w: int,
        max_seq_len: int,
        channel_importances: Tuple[float, ...] = (8.0, 1.0, 1.0),
        patch_sample_magnitude_weight: float = 0.1,
        rng: Optional[_random.Random] = None,
        # build the explicit (b, 1, s, s) attention mask on batches; the model
        # derives masking from image ids, so training/serving paths can turn
        # this off and skip O(b*s^2) host work per batch
        build_attn_mask: bool = True,
        # preprocessing front-end: 'auto' uses the fused Pallas IPT+DCT
        # kernel on TPU (measured 1.28x over XLA at 448px once the whole
        # image fits one VMEM cell; falls back to XLA above MAX_FUSED_AREA);
        # 'pallas' forces the kernel, 'jnp' forces the XLA path.  The two
        # paths produce identical token SETS; ordering among equal-importance
        # tokens can differ by float ties (~5% of positions at 448px).
        use_fused_kernel: str = "auto",
    ):
        self.channels = channels
        self.patch_size = patch_size
        self.sample_patches_beta = sample_patches_beta
        self.max_patch_h = max_patch_h
        self.max_patch_w = max_patch_w
        self.max_seq_len = max_seq_len
        self.channel_importances = tuple(float(x) for x in channel_importances)
        self.patch_sample_magnitude_weight = patch_sample_magnitude_weight
        self.rng = rng
        self.build_attn_mask = build_attn_mask
        self.use_fused_kernel = use_fused_kernel
        self._preproc_cache = {}
        self._postproc_cache = {}

    def _use_fused_pallas(self, h: int, w: int) -> bool:
        """ONE promotion policy for both fused front-ends (encode + decode):
        forced 'pallas', or 'auto' on TPU for RGB images within the
        single-VMEM-cell area guard.  Keeping encode/decode in lockstep
        matters — a policy edit applied to one copy silently desynchronizes
        the serving defaults."""
        from ..kernels.dct_patchify import MAX_FUSED_AREA

        if self.use_fused_kernel == "pallas":
            if self.channels != 3:
                raise ValueError(
                    "use_fused_kernel='pallas' requires 3 channels (IPT/RGB "
                    f"kernels); got channels={self.channels}"
                )
            return True
        return (
            self.use_fused_kernel == "auto"
            and self.channels == 3
            and h * w <= MAX_FUSED_AREA
            and jax.default_backend() == "tpu"
        )

    # ------------------------------------------------------------------ in

    def _get_crop_dims(self, h: int, w: int) -> Tuple[int, int]:
        """Floor (h, w) to patch multiples (reference feature_extraction...py:312-345)."""
        assert h >= self.patch_size and w >= self.patch_size
        p_h = max(h // self.patch_size, 1)
        p_w = max(w // self.patch_size, 1)
        return p_h * self.patch_size, p_w * self.patch_size

    def _build_preproc_fn(self, h: int, w: int):
        """Jitted: RGB (c,h,w) -> (importance-sorted patches, positions, channels).

        The image is IPT-transformed, DCT'd at full size, the DCT plane cropped
        to a patch multiple, patchified, out-of-grid patches dropped, and all
        remaining tokens sorted by importance (score: 0.1*|patch|_inf +
        -(h+w)/channel_importance; reference feature_extraction...py:364-452).
        Only the top `cap` tokens are returned; the data-dependent budget k is
        applied on host by slicing this sorted prefix.
        """
        p = self.patch_size
        c = self.channels
        ch, cw = self._get_crop_dims(h, w)
        ph, pw = ch // p, cw // p

        hh, ww = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
        valid = (hh < self.max_patch_h) & (ww < self.max_patch_w)
        vidx = np.nonzero(valid.reshape(-1))[0]
        hv = hh.reshape(-1)[vidx].astype(np.int32)
        wv = ww.reshape(-1)[vidx].astype(np.int32)
        s_valid = len(vidx)
        total = s_valid * c
        cap = min(total, self.max_seq_len)

        # per-token (patch-major, channel-minor) static metadata
        pos_rep = np.stack([np.repeat(hv, c), np.repeat(wv, c)], axis=-1)  # (total, 2)
        ch_rep = np.tile(np.arange(c, dtype=np.int32), s_valid)  # (total,)
        pos_dist = -(hv + wv).astype(np.float32)  # (s_valid,)
        chan_imp = np.asarray(self.channel_importances, dtype=np.float32)

        vidx_j = jnp.asarray(vidx)
        pos_rep_j = jnp.asarray(pos_rep)
        ch_rep_j = jnp.asarray(ch_rep)
        pos_dist_j = jnp.asarray(pos_dist)
        chan_imp_j = jnp.asarray(chan_imp)
        mag_w = self.patch_sample_magnitude_weight
        use_pallas = self._use_fused_pallas(h, w)

        def tokens_of(ims):
            """(B, c, h, w) RGB -> (B, ph*pw, c, p*p) cropped DCT patch tokens.

            uint8 input is converted on device (x/255) — ship bytes, not
            floats: 4x less host->device transfer."""
            if ims.dtype == jnp.uint8:
                ims = ims.astype(jnp.float32) / 255.0
            if use_pallas:
                from ..kernels.dct_patchify import fused_ipt_dct_patchify

                return fused_ipt_dct_patchify(ims, p, ch, cw)
            x = rgb_to_ipt(ims.astype(jnp.float32))
            x = dct2(x)[:, :, :ch, :cw]  # crop the DCT plane to a patch multiple
            # patchify: b c (ph p) (pw p) -> b (ph*pw) c (p*p)
            b = ims.shape[0]
            x = x.reshape(b, c, ph, p, pw, p).transpose(0, 2, 4, 1, 3, 5)
            return x.reshape(b, ph * pw, c, p * p)

        def core_batch(ims):
            x = jnp.take(tokens_of(ims), vidx_j, axis=1)  # (B, s_valid, c, p*p)
            b = ims.shape[0]

            mags = jnp.max(jnp.abs(x), axis=-1) * mag_w  # (B, s_valid, c)
            scores = mags + pos_dist_j[None, :, None] / chan_imp_j[None, None, :]
            order = jnp.argsort(-scores.reshape(b, -1), axis=-1)[:, :cap]

            flat = x.reshape(b, total, p * p)
            patches = jnp.take_along_axis(flat, order[..., None], axis=1)
            positions = pos_rep_j[order]  # (B, cap, 2)
            channels = ch_rep_j[order]  # (B, cap)
            return patches, positions, channels

        def core_single(im):
            patches, positions, channels = core_batch(im[None])
            return patches[0], positions[0], channels[0]

        return {
            "single": jax.jit(core_single),
            "batched": jax.jit(core_batch),
            "total": total,
            "grid": (ph, pw),
        }

    def _preproc_entry(self, h: int, w: int) -> dict:
        # max_seq_len is part of the key: norm calibration temporarily raises
        # it to the full lossless grid (train/loop.py train_patch_norm), and a
        # cached cap-3072 program serving the cap-256 training phase would
        # ship 12x more sorted-prefix data per image over the host link.
        # Single lookup point — preprocess and preprocess_many must never
        # diverge on the key.
        key = (h, w, self.max_seq_len)
        if key not in self._preproc_cache:
            self._preproc_cache[key] = self._build_preproc_fn(h, w)
        return self._preproc_cache[key]

    def _get_preproc_fn(self, h: int, w: int):
        e = self._preproc_entry(h, w)
        return e["single"], e["total"], e["grid"]

    def preprocess_many(self, images: Sequence) -> List[dict]:
        """Batched preprocessing: group by image shape, one vmapped jit call
        per shape group.  This is the production encode path — dispatch and
        DCT/sort work amortize over the whole group, and with size bucketing
        (data/dataset.py) the number of compiled shapes is bounded.

        Returns per-image dicts in input order (same records as preprocess).
        """
        by_shape = {}
        for i, im in enumerate(images):
            im = np.asarray(im)
            by_shape.setdefault(im.shape, []).append((i, im))

        out: List[Optional[dict]] = [None] * len(images)
        for (c, h, w), group in by_shape.items():
            assert c == self.channels
            e = self._preproc_entry(h, w)
            stack = np.stack([im for _, im in group])
            patches, positions, channels = e["batched"](stack)
            patches = np.asarray(patches)
            positions = np.asarray(positions)
            channels = np.asarray(channels)
            for j, (i, _) in enumerate(group):
                k = self.sample_k(e["total"])
                out[i] = dict(
                    patches=patches[j, :k],
                    positions=positions[j, :k],
                    channels=channels[j, :k],
                    original_sizes=(h, w),
                    patch_sizes=e["grid"],
                )
        return out  # type: ignore[return-value]

    def sample_k(self, total: int) -> int:
        """Stochastic token budget (reference feature_extraction...py:429-437)."""
        k = total
        if self.sample_patches_beta > 0.0:
            k = min(round(exp_trunc_dist(self.sample_patches_beta, self.rng)), k)
            k = max(1, k)
        return min(k, self.max_seq_len)

    def preprocess(self, im) -> dict:
        """Single image (c, h, w) RGB in [0,1] -> per-image token dict.

        Returns dict(patches (k, p*p), positions (k, 2), channels (k,),
        original_sizes (h, w), patch_sizes (ph, pw)) — same record as the
        reference's preprocess (feature_extraction...py:154-177).
        """
        im = np.asarray(im)
        c, h, w = im.shape
        assert c == self.channels
        fn, total, (ph, pw) = self._get_preproc_fn(h, w)
        patches, positions, channels = fn(im)
        k = self.sample_k(total)
        return dict(
            patches=np.asarray(patches)[:k],
            positions=np.asarray(positions)[:k],
            channels=np.asarray(channels)[:k],
            original_sizes=(h, w),
            patch_sizes=(ph, pw),
        )

    # --------------------------------------------------------------- batches

    def iter_batches(
        self,
        dataloader: Iterable,
        batch_size: Optional[int] = None,
        drain: bool = False,
    ):
        """Greedy-pack a stream of per-image dicts into DCTPatches batches.

        Same contract as the reference (feature_extraction...py:179-287):
        `dataloader` yields dicts of lists (column -> per-image values);
        leftover open rows are carried across pulls.  With batch_size None,
        every pull is flushed into a single batch.

        drain=True additionally flushes the packing state when the stream
        ends (final batches may have fewer rows) — the reference silently
        drops the tail, which loses data in finite export jobs.
        """
        state: Optional[GroupPatchesState] = None
        cum_original_sizes: List[Tuple[int, int]] = []
        cum_patch_sizes: List[Tuple[int, int]] = []
        cum_data: dict = {}

        dataloader = iter(dataloader)
        while True:
            try:
                dict_data = next(dataloader)
            except StopIteration:
                if drain and state is not None:
                    if state.group:
                        state.groups.append(state.group)
                        state.group = []
                        state.seq_len = 0
                    while state.groups:
                        take = state.groups[: batch_size or len(state.groups)]
                        state.groups = state.groups[len(take) :]
                        n_items = sum(len(g) for g in take)
                        take_orig, cum_original_sizes = (
                            cum_original_sizes[:n_items],
                            cum_original_sizes[n_items:],
                        )
                        take_patch, cum_patch_sizes = (
                            cum_patch_sizes[:n_items],
                            cum_patch_sizes[n_items:],
                        )
                        take_data = {k: v[:n_items] for k, v in cum_data.items()}
                        cum_data = {k: v[n_items:] for k, v in cum_data.items()}
                        yield batch_groups(
                            take,
                            self.max_seq_len,
                            patch_sizes=tuple(take_patch),
                            original_sizes=tuple(take_orig),
                            _data=take_data or None,
                            with_attn_mask=self.build_attn_mask,
                        )
                return

            patches = dict_data["patches"]
            positions = dict_data["positions"]
            channels = dict_data["channels"]
            original_sizes = dict_data["original_sizes"]
            patch_sizes = dict_data["patch_sizes"]
            misc = {
                k: v
                for k, v in dict_data.items()
                if k not in {"patches", "positions", "channels", "original_sizes", "patch_sizes"}
            }

            cum_original_sizes += list(original_sizes)
            cum_patch_sizes += list(patch_sizes)
            for k, v in misc.items():
                cum_data.setdefault(k, []).extend(v)

            items = [
                (np.asarray(p), np.asarray(pos), np.asarray(ch))
                for p, pos, ch in zip(patches, positions, channels)
            ]
            state = group_patches_by_max_seq_len(items, self.max_seq_len, state)

            if batch_size is None and state.group:
                state.groups.append(state.group)
                state.group = []
                state.seq_len = 0

            if batch_size is None or len(state.groups) > batch_size:
                take_groups = state.groups[:batch_size] if batch_size is not None else state.groups
                rest_groups = state.groups[batch_size:] if batch_size is not None else []

                n_items = sum(len(g) for g in take_groups)
                take_orig, cum_original_sizes = (
                    cum_original_sizes[:n_items],
                    cum_original_sizes[n_items:],
                )
                take_patch, cum_patch_sizes = cum_patch_sizes[:n_items], cum_patch_sizes[n_items:]
                take_data = {k: v[:n_items] for k, v in cum_data.items()}
                cum_data = {k: v[n_items:] for k, v in cum_data.items()}

                state = GroupPatchesState(
                    groups=rest_groups, group=state.group, seq_len=state.seq_len
                )

                batch = batch_groups(
                    take_groups,
                    self.max_seq_len,
                    patch_sizes=tuple(take_patch),
                    original_sizes=tuple(take_orig),
                    _data=take_data or None,
                    with_attn_mask=self.build_attn_mask,
                )
                if batch_size is not None:
                    assert batch.patches.shape[0] == batch_size
                yield batch

    # ------------------------------------------------------------------ out

    def revert_patching(self, output: DCTPatches) -> List[np.ndarray]:
        """Scatter packed tokens back onto zeroed per-image DCT patch canvases.

        One vectorized scatter for the whole batch (vs. the reference's
        per-token loop, feature_extraction...py:607-656).  Returns a list of
        (c, ph*p, pw*p) DCT-plane arrays, one per packed image.
        """
        p = self.patch_size
        c = self.channels
        # canvas must cover the largest patch grid in the batch: images bigger
        # than the max grid keep their full (ph, pw) canvas with zeros outside
        # the kept region (reference feature_extraction...py:633-637)
        H = max([self.max_patch_h] + [ph for ph, _ in output.patch_sizes])
        W = max([self.max_patch_w] + [pw for _, pw in output.patch_sizes])

        tokens = np.asarray(output.patches)
        ids = np.asarray(output.batched_image_ids)
        pad = np.asarray(output.key_pad_mask)
        chs = np.asarray(output.patch_channels)
        pos = np.asarray(output.patch_positions)
        b, s, pz = tokens.shape

        # global image index per token: rows contribute images in order
        n_per_row = np.where((~pad).any(axis=1), ids.max(axis=1, where=~pad, initial=0) + 1, 0)
        offsets = np.concatenate([[0], np.cumsum(n_per_row)])
        n_images = int(offsets[-1])
        assert n_images == len(output.patch_sizes), (
            f"{n_images} packed images vs {len(output.patch_sizes)} metadata entries"
        )

        gid = offsets[:-1, None] + ids  # (b, s)
        flat_idx = ((gid * c + chs) * H + pos[..., 0]) * W + pos[..., 1]
        trash = n_images * c * H * W
        flat_idx = np.where(pad, trash, flat_idx).reshape(-1)

        canvas = np.zeros((n_images * c * H * W + 1, pz), dtype=tokens.dtype)
        canvas[flat_idx] = tokens.reshape(-1, pz)
        canvas = canvas[:-1].reshape(n_images, c, H, W, pz)

        images = []
        for i, (ph, pw) in enumerate(output.patch_sizes):
            img = canvas[i, :, :ph, :pw, :]  # (c, ph, pw, p*p)
            img = img.reshape(c, ph, pw, p, p).transpose(0, 1, 3, 2, 4).reshape(c, ph * p, pw * p)
            images.append(img)
        return images

    def _get_postproc_fn(self, ch: int, cw: int, h: int, w: int):
        key = (ch, cw, h, w)
        if key not in self._postproc_cache:
            # same promotion policy as the forward front-end (shared helper):
            # the single-cell fused IDCT+IPT->RGB kernel is the TPU default
            # while the image fits one VMEM cell (measured vs the XLA
            # pad->idct2->ipt_to_rgb path on v5e — kernels/idct_unpatchify.py)
            if self._use_fused_pallas(h, w):
                from ..kernels.idct_unpatchify import fused_idct_unpatchify_rgb

                fn = jax.jit(
                    lambda dct_imgs: fused_idct_unpatchify_rgb(dct_imgs, h, w)
                )
            else:

                @jax.jit
                def fn(dct_imgs):
                    # (B, c, ch, cw) batched canvases
                    b = dct_imgs.shape[0]
                    canvas = jnp.zeros((b, self.channels, h, w), dtype=jnp.float32)
                    canvas = canvas.at[:, :, :ch, :cw].set(dct_imgs.astype(jnp.float32))
                    px = idct2(canvas)
                    return ipt_to_rgb(px)

            self._postproc_cache[key] = fn
        return self._postproc_cache[key]

    def postprocess(self, x: DCTPatches) -> List[np.ndarray]:
        """Packed (un-normalized) DCT patches -> list of RGB images.

        Zero-pads each reconstructed DCT plane back to the original image size,
        runs the inverse DCT at that size, and converts IPT -> RGB
        (reference feature_extraction...py:289-310).

        Images sharing a (canvas, original) shape are batched into one device
        call (the common case under size bucketing).
        """
        dct_images = self.revert_patching(x)
        # group image indices by (canvas shape, original size)
        groups: dict = {}
        for i, (dct_img, (h, w)) in enumerate(zip(dct_images, x.original_sizes)):
            key = (dct_img.shape[-2], dct_img.shape[-1], h, w)
            groups.setdefault(key, []).append(i)

        images: List[Optional[np.ndarray]] = [None] * len(dct_images)
        for (ih, iw, h, w), idxs in groups.items():
            fn = self._get_postproc_fn(ih, iw, h, w)
            stack = np.stack([dct_images[i] for i in idxs])
            out = np.asarray(fn(stack))
            for j, i in enumerate(idxs):
                images[i] = out[j]
        return images  # type: ignore[return-value]
