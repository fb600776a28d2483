"""Regression tests for scripts/tpu_fewstep_check.write_report.

The fewstep harness merges its results into fidelity_report.json; a
rerun must supersede the prefix's whole entry (stale candidates from an
earlier run with different weights must not masquerade as current) while
leaving the other prefix's namespace (fewstep vs fewstep_int8) and every
non-fewstep key untouched."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "tpu_fewstep_check",
        os.path.join(REPO, "scripts", "tpu_fewstep_check.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _seps(auc, fpd):
    return {"Etot": 0.0, "ERatio": 0.0, "layer_profile_L1": 0.0,
            "classifier_auc": auc, "fpd": fpd}


def test_write_report_supersedes_prefix(tmp_path, monkeypatch):
    fs = _load_module()
    report_path = tmp_path / "fidelity_report.json"
    stale = {
        "fewstep_Consistency_1_ok": False,   # candidate not re-measured
        "fewstep_DDim_50_ok": False,          # re-measured below
        "fewstep_best": None,
        "fewstep_int8_DDim_50_ok": True,      # other namespace: keep
        "layer_ok": False,                    # non-fewstep: keep
    }
    report_path.write_text(json.dumps(stale))
    monkeypatch.setattr(fs, "REPORT", str(report_path))

    baseline = _seps(0.50, 0.10)
    results = {
        "DDim_400": {"seps": baseline, "ok": True, "rel_ok": False,
                     "gen_s": 1.0},
        "DDim_50": {"seps": _seps(0.55, 0.20), "ok": True, "rel_ok": True,
                    "gen_s": 1.0},
        "DPMPP2M_18": {"seps": _seps(0.95, 2.0), "ok": False,
                       "rel_ok": False, "gen_s": 1.0},
    }
    speeds = {"DDim_50": 250.0, "DPMPP2M_18": 660.0}
    fs.write_report(results, speeds, baseline, int8=False)

    out = json.loads(report_path.read_text())
    # stale candidate gone; re-measured candidate updated
    assert "fewstep_Consistency_1_ok" not in out
    assert out["fewstep_DDim_50_ok"] is True
    # best = fastest passing; the failing faster candidate is not picked
    assert out["fewstep_best"] == "DDim_50"
    assert out["fewstep_best_rel"] == "DDim_50"
    assert out["fewstep_teacher_ok"] is True
    # other namespaces untouched
    assert out["fewstep_int8_DDim_50_ok"] is True
    assert out["layer_ok"] is False
    # the baseline itself is never a candidate row
    assert "fewstep_DDim_400_ok" not in out


def test_write_report_flags_unconverged_teacher(tmp_path, monkeypatch,
                                                capsys):
    fs = _load_module()
    report_path = tmp_path / "fidelity_report.json"
    monkeypatch.setattr(fs, "REPORT", str(report_path))

    baseline = _seps(0.95, 5.0)  # fails the absolute gate
    results = {
        "DDim_400": {"seps": baseline, "ok": False, "rel_ok": False,
                     "gen_s": 1.0},
        # matches the (bad) baseline within noise: rel gate passes
        "DDim_50": {"seps": _seps(0.94, 4.9), "ok": False, "rel_ok": True,
                    "gen_s": 1.0},
    }
    fs.write_report(results, {"DDim_50": 250.0}, baseline, int8=False)

    out = json.loads(report_path.read_text())
    assert out["fewstep_teacher_ok"] is False
    assert out["fewstep_best"] is None          # absolute gate: nothing
    assert out["fewstep_best_rel"] == "DDim_50"  # relative verdict survives
    assert "teacher has not converged" in capsys.readouterr().out


def test_write_report_null_speed_when_no_candidate(tmp_path, monkeypatch):
    """A None verdict must carry a None speed — a fabricated 0.0 next to
    a null tag reads as a (terrible) measured throughput."""
    fs = _load_module()
    report_path = tmp_path / "fidelity_report.json"
    monkeypatch.setattr(fs, "REPORT", str(report_path))

    baseline = _seps(0.95, 5.0)
    results = {
        "DDim_400": {"seps": baseline, "ok": False, "rel_ok": False,
                     "gen_s": 1.0},
        "DDim_50": {"seps": _seps(0.99, 9.0), "ok": False, "rel_ok": False,
                    "gen_s": 1.0},
    }
    fs.write_report(results, {"DDim_50": 250.0}, baseline, int8=False)

    out = json.loads(report_path.read_text())
    assert out["fewstep_best"] is None
    assert out["fewstep_best_showers_per_sec"] is None
    assert out["fewstep_best_rel"] is None
    assert out["fewstep_best_rel_showers_per_sec"] is None


def test_parse_seed_both_spellings():
    fs = _load_module()
    assert fs.parse_seed(["100", "--seed", "42", "--int8"]) == (
        42, ["100", "--int8"])
    assert fs.parse_seed(["--seed=7", "100"]) == (7, ["100"])
    assert fs.parse_seed(["100"]) == (1234, ["100"])
