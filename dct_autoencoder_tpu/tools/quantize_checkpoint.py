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

--gate turns the agreement measurement into an actionable serving decision:
the verdict is RECORDED — int8_gate.json next to the quantized model, plus
an int8_serving.json pointer in the SOURCE checkpoint dir that
DCTPipeline.from_pretrained(prefer_int8='auto') consumes, so the serving
default flips to int8 per checkpoint automatically, and only when that
checkpoint earned it.

Two gate modes (--gate_mode):
  * absolute (legacy): token agreement >= --gate_threshold (default 0.999).
    The right contract when the BIT-EXACT token stream is the product (AR
    token exports).  The round-3 study proved this is unreachable for
    tokenizers whose LFQ sign margins sit at the 8-bit noise radius: on the
    5k checkpoint the int8 flip rate (226.9/10k) EQUALS what any
    equal-magnitude random weight perturbation produces (221.4/10k) — the
    flips measure the model, not the quantizer (docs/int8_study_r3.md).
  * relative (the pixel-serving contract): PASS iff BOTH
      (a) int8 flip rate <= --flip_ratio_max x the checkpoint's own
          noise-equivalence floor (re-measured in-run with the study's
          probe, 2 seeds) — int8 introduces no more flips than ANY
          perturbation of rounding magnitude, and
      (b) end-to-end reconstruction PSNR drops by at most
          --psnr_tolerance dB vs the fp pipeline on the validation images
          (the study measured +0.007 dB — flipped tokens are near-boundary
          codes with negligible decoded contribution).
    This is the principled gate for image-serving deployments; the absolute
    mode remains for bit-exact contracts.

No reference counterpart (the reference's 8-bit machinery is the optimizer,
main.py:420-425); this is a serving capability upgrade.
"""
from __future__ import annotations

import argparse
import json
import os


def main(model_path: str, out_path: str, validate_images: str = "", group_size: int = 0,
         mode: str = None, bf16_layers: str = "", gate: bool = False,
         gate_threshold: float = 0.999, gate_mode: str = "absolute",
         flip_ratio_max: float = 1.25, psnr_tolerance: float = 0.05,
         gate_noise_seeds: int = 2) -> None:
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
            # the int8 model was saved above with the UNCALIBRATED patchnorm;
            # re-save so what serving loads is what the gate measured
            qmodel.save_pretrained(out_path)
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
            extra = {}
            if gate_mode == "relative":
                from ..ops.stats import psnr as psnr_fn
                from ..pipeline import DCTPipeline
                from .int8_study import _noise_equiv_model

                codes_fp = np.asarray(out_fp["codes"])
                noise_agrees = []
                # the floor is a MEAN over perturbation draws: more seeds =
                # a strictly better estimate (the 2-seed default keeps the
                # gate cheap; campaigns that gate a serving flip should use
                # 4+ so a low draw can't fail/pass the ratio by chance)
                seeds = list(range(1, max(int(gate_noise_seeds), 1) + 1))
                for seed in seeds:
                    # the probe perturbs exactly the weights the gated int8
                    # form rounds (bf16-protected layers untouched).  It
                    # models WEIGHT-rounding noise only; for the recommended
                    # dynamic+first-2-bf16 config that is the right floor —
                    # the r3 study measured that config AT the weight-only
                    # flip floor (258 vs 262/10k, docs/int8_study_r3.md)
                    out_n = _noise_equiv_model(
                        model, seed, skip_layers=layers
                    ).forward(nb, training=False)
                    noise_agrees.append(
                        (codes_fp[valid] == np.asarray(out_n["codes"])[valid]).mean()
                    )
                noise_agree = float(np.mean(noise_agrees))
                int8_flips = (1.0 - float(agree)) * 1e4
                noise_flips = (1.0 - noise_agree) * 1e4
                flip_ok = int8_flips <= flip_ratio_max * max(noise_flips, 1e-9)

                # end-to-end pixel contract: PSNR through the full pipeline
                pipe_fp = DCTPipeline(model, proc)
                pipe_q = DCTPipeline(qmodel, proc)
                mean_psnr = lambda pipe: float(
                    np.mean(
                        [
                            psnr_fn(r, o)
                            for r, o in zip(pipe.decode(pipe.encode(ims)), ims)
                        ]
                    )
                )
                psnr_fp, psnr_q = mean_psnr(pipe_fp), mean_psnr(pipe_q)
                psnr_ok = (psnr_q - psnr_fp) >= -psnr_tolerance
                ok = bool(flip_ok and psnr_ok)
                extra = {
                    "int8_flips_per_10k": round(int8_flips, 1),
                    "noise_floor_flips_per_10k": round(noise_flips, 1),
                    "noise_seeds": seeds,
                    # what the floor models: weight-rounding noise on the
                    # layers the quantizer actually touches
                    "noise_floor_kind": "weight_rounding",
                    "noise_floor_skip_layers": list(layers),
                    "flip_ratio": round(int8_flips / max(noise_flips, 1e-9), 3),
                    "flip_ratio_max": flip_ratio_max,
                    "flip_ok": bool(flip_ok),
                    "psnr_fp": round(psnr_fp, 3),
                    "psnr_int8": round(psnr_q, 3),
                    "psnr_delta": round(psnr_q - psnr_fp, 4),
                    "psnr_tolerance": psnr_tolerance,
                    "psnr_ok": bool(psnr_ok),
                }
                print(
                    f"relative gate: int8 {int8_flips:.1f}/10k vs noise floor "
                    f"{noise_flips:.1f}/10k (ratio {extra['flip_ratio']}, "
                    f"max {flip_ratio_max}); psnr {psnr_fp:.3f} -> {psnr_q:.3f} dB "
                    f"(delta {extra['psnr_delta']:+.4f}, tol -{psnr_tolerance})"
                )
            else:
                ok = bool(agree >= gate_threshold)
            record = {
                "agreement": float(agree),
                # threshold is the ABSOLUTE mode's criterion; relative-mode
                # records carry their own criteria in `extra` instead
                **(
                    {"threshold": float(gate_threshold)}
                    if gate_mode == "absolute"
                    else {}
                ),
                "gate_mode": gate_mode,
                **extra,
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
            crit = (
                f"agreement {agree:.4f} vs threshold {gate_threshold}"
                if gate_mode == "absolute"
                else "flip-floor + psnr criteria above"
            )
            print(
                f"gate[{gate_mode}]: {'PASS' if ok else 'FAIL'} ({crit}) — "
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
    p.add_argument("--gate_mode", default="absolute", choices=("absolute", "relative"),
                   help="absolute: agreement >= threshold (bit-exact token "
                        "contract). relative: int8 flips <= flip_ratio_max x "
                        "the checkpoint's own noise floor AND end-to-end PSNR "
                        "within psnr_tolerance (pixel-serving contract)")
    p.add_argument("--flip_ratio_max", type=float, default=1.25)
    p.add_argument("--psnr_tolerance", type=float, default=0.05)
    p.add_argument("--gate_noise_seeds", type=int, default=2,
                   help="perturbation draws averaged into the relative-mode "
                        "noise floor (more = better floor estimate)")
    args = p.parse_args()
    main(args.model_path, args.out_path, args.validate_images, args.group_size,
         args.mode, args.bf16_layers, args.gate, args.gate_threshold,
         args.gate_mode, args.flip_ratio_max, args.psnr_tolerance,
         args.gate_noise_seeds)
