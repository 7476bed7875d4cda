"""Pure-function tests for the quality-gate machinery (scripts/) — the
window checker, metric collection guards, and multi-seed band derivation.
No training runs; the gated pipeline itself is exercised by
scripts/quality_gate.py on TPU (verify skill)."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault(name, mod)
    spec.loader.exec_module(mod)
    return mod


qg = _load("quality_gate")
calib = _load("calibrate_quality_windows")


def test_check_windows_flags_out_of_band_and_missing():
    windows = {"a": [0.0, 1.0], "b": [5.0, 6.0], "_calibration": {"x": 1}}
    failures = qg.check_windows({"a": 0.5}, windows)
    assert len(failures) == 1 and failures[0].startswith("b:")
    failures = qg.check_windows({"a": 2.0, "b": 5.5}, windows)
    assert len(failures) == 1 and failures[0].startswith("a:")
    # NaN is a failure, calibration metadata is ignored
    failures = qg.check_windows({"a": float("nan"), "b": 5.5}, windows)
    assert len(failures) == 1


def test_collect_metrics_tolerates_truncated_artifacts(tmp_path):
    # empty metrics.jsonl + no analysis dir: no IndexError (ADVICE r4) —
    # the missing keys surface via check_windows as gate failures
    (tmp_path / "metrics.jsonl").write_text("")
    out = qg.collect_metrics(str(tmp_path))
    assert out == {}
    failures = qg.check_windows(out, {"train_loss_first": [0, 1]})
    assert failures == ["train_loss_first: metric missing from run artifacts"]


def test_collect_metrics_reads_rows(tmp_path):
    rows = [
        {"step": 1, "loss/train": 100.0},
        {"step": 2, "loss/train": 50.0},
        {"step": 2, "loss/validation": 60.0},
    ]
    (tmp_path / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")
    out = qg.collect_metrics(str(tmp_path))
    assert out["train_loss_first"] == 100.0
    assert out["train_loss_final"] == 50.0
    assert out["val_loss_final"] == 60.0
    assert out["val_rows_finite"] == 1.0


def test_derive_windows_bands_cover_all_seeds():
    per_seed = {
        0: {"train_loss_final": 20.0, "imagination_ssim_image": 0.06,
            "val_rows_finite": 1.0},
        1: {"train_loss_final": 24.0, "imagination_ssim_image": 0.10,
            "val_rows_finite": 1.0},
    }
    block = calib.derive_windows(per_seed)
    lo, hi = block["train_loss_final"]
    assert lo <= 20.0 and hi >= 24.0
    # SSIM gets a REAL upper bound (VERDICT r4 #6): the round-4 sabotage
    # value 0.65 must be excluded
    slo, shi = block["imagination_ssim_image"]
    assert shi < 0.65 and slo <= 0.06
    assert block["val_rows_finite"] == [1.0, 1.0]
    assert block["_calibration"]["seeds"] == [0, 1]


def test_gate_config_matrix_entries():
    assert set(qg.CONFIGS) == {"default", "categorical", "chunk200"}
    assert qg.CONFIGS["default"][1] == ""
    assert qg.CONFIGS["categorical"][1] == "_categorical"
