"""Tests for the A/B report generator (tools/ab_report.py)."""
import json

from dct_autoencoder_tpu.tools.ab_report import (
    arm_record,
    images_at,
    images_seen_series,
)


def test_images_seen_trapezoid_constant_rate():
    metrics = [{"step": s, "images_per_batch": 10} for s in range(0, 501, 50)]
    series = images_seen_series(metrics)
    # constant 10 images/step -> exactly 10*s at every sampled step
    assert series[-1] == (500, 5000.0)
    assert images_at(series, 250) == 2500.0
    # extrapolation continues at the final average rate
    assert images_at(series, 600) == 6000.0


def test_images_seen_dedups_restart_overlap():
    # a watchdog restart replays steps 100..200 with a different rate; the
    # LAST occurrence (what the resumed optimizer consumed) wins
    metrics = (
        [{"step": s, "images_per_batch": 10} for s in range(0, 201, 50)]
        + [{"step": s, "images_per_batch": 20} for s in range(100, 301, 50)]
    )
    series = images_seen_series(metrics)
    by_step = dict(series)
    # last-wins dedup: step 100 takes the replayed rate 20, so the 50->100
    # trapezoid averages (10+20)/2; everything after runs at 20/step
    assert by_step[100] == 500.0 + 0.5 * (10 + 20) * 50
    assert by_step[300] == by_step[100] + 20 * 200


def test_arm_record_merges_evals(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    (d / "metrics.jsonl").write_text(
        "\n".join(
            json.dumps({"step": s, "images_per_batch": 10, "loss": -0.1})
            for s in range(0, 401, 50)
        )
    )
    (d / "eval.jsonl").write_text(
        json.dumps({"step": "ckpt_000200", "psnr": 11.0, "perplexity": 100.0})
        + "\n"
        + json.dumps({"step": "model", "psnr": 12.0, "perplexity": 200.0})
    )
    rec = arm_record(str(d))
    assert rec["max_step"] == 400
    rows = rec["held_out"]
    assert rows[0]["step"] == 200 and rows[0]["images_seen_est"] == 2000
    # 'model' maps to the run's final step
    assert rows[1]["step"] == 400 and rows[1]["psnr"] == 12.0
    assert rec["train_fixtures"] == []
