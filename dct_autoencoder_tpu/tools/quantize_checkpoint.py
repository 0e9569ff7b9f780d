"""Convert a trained checkpoint to the int8 serving form.

Usage:
  python -m dct_autoencoder_tpu.tools.quantize_checkpoint \
      --model_path out/<run>/model --out_path out/<run>/model-int8 \
      [--validate_images /root/reference/images]

Loads a save_pretrained checkpoint, rewrites the transformer stacks to
per-channel int8 weights (models/quant.py), saves the quantized model (same
save_pretrained layout, config carries quantize_int8=true so from_pretrained
rebuilds Int8Dense automatically), and optionally reports token agreement +
reconstruction drift vs the fp model on a validation folder.

--gate turns the agreement measurement into an actionable serving decision
(docs/int8_study_r3.md predicts converged checkpoints pass): the measured
token agreement is compared against --gate_threshold (default 0.999) and the
verdict is RECORDED — int8_gate.json next to the quantized model, plus an
int8_serving.json pointer in the SOURCE checkpoint dir that
DCTPipeline.from_pretrained(prefer_int8='auto') consumes, so the serving
default flips to int8 per checkpoint automatically, and only when that
checkpoint earned it.

No reference counterpart (the reference's 8-bit machinery is the optimizer,
main.py:420-425); this is a serving capability upgrade.
"""
from __future__ import annotations

import argparse
import json
import os


def main(model_path: str, out_path: str, validate_images: str = "", group_size: int = 0,
         mode: str = None, bf16_layers: str = "", gate: bool = False,
         gate_threshold: float = 0.999) -> None:
    import numpy as np

    from ..models.autoencoder import DCTAutoencoder
    from ..models.quant import quantize_model_for_serving

    if gate and not validate_images:
        raise SystemExit("--gate needs --validate_images to measure agreement on")
    if gate and mode is None:
        # the study's recommended opt-in: dynamic int8 with the two most
        # flip-sensitive (earliest) layers kept bf16
        mode = "dynamic"
        if not bf16_layers:
            bf16_layers = "0,1"

    model = DCTAutoencoder.from_pretrained(model_path)
    layers = tuple(int(i) for i in bf16_layers.split(",") if i)
    qmodel = quantize_model_for_serving(
        model, mode=mode, encoder_bf16_layers=layers, decoder_bf16_layers=layers,
        group_size=group_size,
    )
    qmodel.save_pretrained(out_path)
    n_int8 = sum(
        int(np.prod(p.shape))
        for p in __import__("jax").tree_util.tree_leaves(qmodel.params)
        if getattr(p, "dtype", None) == np.int8
    )
    print(f"saved int8 model to {out_path} ({n_int8 / 1e6:.1f}M int8 weights)")

    if validate_images:
        from PIL import Image

        from ..models.factory import get_model_and_processor
        from ..models.patchnorm import calibrate_patchnorm_batch

        _, proc = get_model_and_processor(model.config, sample_patches_beta=0.0)
        proc.build_attn_mask = False
        files = sorted(
            f
            for f in os.listdir(validate_images)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )[:6]
        ims = []
        for f in files:
            im = Image.open(os.path.join(validate_images, f)).convert("RGB")
            im = im.resize((448, 448), Image.BICUBIC)
            ims.append(np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0)
        ds = [proc.preprocess(im) for im in ims]
        cols = {k: [d[k] for d in ds] for k in ds[0]}
        batch = next(proc.iter_batches(iter([cols]), batch_size=None))
        if not np.asarray(model.patchnorm.n).max() > 0:
            model.patchnorm, _ = calibrate_patchnorm_batch(model.patchnorm, batch)
            qmodel.patchnorm = model.patchnorm
        nb = model.normalize_(batch)
        out_fp = model.forward(nb, training=False)
        out_q = qmodel.forward(nb, training=False)
        valid = ~np.asarray(nb.key_pad_mask)
        agree = (
            np.asarray(out_fp["codes"])[valid] == np.asarray(out_q["codes"])[valid]
        ).mean()
        a = np.asarray(out_fp["dct_patches"].patches)[valid]
        b = np.asarray(out_q["dct_patches"].patches)[valid]
        drift = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
        print(f"validation: token agreement {agree:.4f}, mean rec drift {drift:.4f}")

        if gate:
            ok = bool(agree >= gate_threshold)
            record = {
                "agreement": float(agree),
                "threshold": float(gate_threshold),
                "pass": ok,
                "mode": mode,
                "bf16_layers": list(layers),
                "group_size": group_size,
                "n_validation_images": len(ims),
                "source_model": os.path.abspath(model_path),
                "int8_model": os.path.abspath(out_path),
                # survives copying/moving the checkpoint tree to another
                # host: the loader resolves this against the checkpoint dir
                "int8_model_rel": os.path.relpath(
                    os.path.abspath(out_path), os.path.abspath(model_path)
                ),
            }
            with open(os.path.join(out_path, "int8_gate.json"), "w") as f:
                json.dump(record, f, indent=2)
            # the pointer DCTPipeline.from_pretrained(prefer_int8='auto')
            # consumes: lives in the SOURCE checkpoint dir so loading the fp
            # path automatically serves the gated int8 form
            with open(os.path.join(model_path, "int8_serving.json"), "w") as f:
                json.dump(record, f, indent=2)
            print(
                f"gate: {'PASS' if ok else 'FAIL'} "
                f"(agreement {agree:.4f} vs threshold {gate_threshold}) — "
                f"{'serving flips to int8' if ok else 'serving stays fp'} "
                f"for this checkpoint (int8_serving.json)"
            )


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--out_path", required=True)
    p.add_argument("--validate_images", default="")
    p.add_argument("--group_size", type=int, default=0, help="group-wise weight scales over the input dim (0 = per-output-channel)")
    p.add_argument("--mode", default=None, help="weight_only (default) or dynamic")
    p.add_argument("--bf16_layers", default="", help="comma list of layer idxs kept bf16 in both stacks; the recommended max-throughput config is --mode dynamic --bf16_layers 0,1 (docs/int8_study_r3.md)")
    p.add_argument("--gate", action="store_true", help="measure token agreement vs --gate_threshold and RECORD the serving decision (int8_serving.json in the source dir; DCTPipeline prefer_int8='auto' consumes it)")
    p.add_argument("--gate_threshold", type=float, default=0.999)
    args = p.parse_args()
    main(args.model_path, args.out_path, args.validate_images, args.group_size,
         args.mode, args.bf16_layers, args.gate, args.gate_threshold)
