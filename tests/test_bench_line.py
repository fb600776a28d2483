"""The bench scoreboard line must stay driver-parseable.

Round 3's bench line carried the full ~90-key fidelity dump; the driver
records only the output tail, the line's head was cut off, and
`BENCH_r03.json` recorded `"parsed": null` — every round-3 headline
number lost.  These tests pin the compact selection
(`bench.compact_fidelity_extras`) and bound the final line's size
against the repo's LIVE fidelity_report.json, so a future key explosion
fails here instead of at the driver.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

# conservative ceiling: BENCH_r02 parsed fine at ~740 chars; the r3
# failure was ~5kB+.  2.5kB leaves room for every family + fewstep keys.
MAX_LINE = 2500


def _line_for(fid, n_measured_extras=14):
    measured = {f"m{i}": 123.456 for i in range(n_measured_extras)}
    extras = {**measured, **bench.compact_fidelity_extras(fid)}
    return json.dumps({
        "metric": "ds2_showers_per_sec_per_chip_400step_ddim",
        "value": 32.7, "unit": "showers/sec/chip", "vs_baseline": 1151.0,
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in extras.items()},
    })


def test_live_report_yields_bounded_line():
    with open(os.path.join(REPO, "fidelity_report.json")) as f:
        fid = json.load(f)
    line = _line_for(fid)
    assert len(line) < MAX_LINE, len(line)
    parsed = json.loads(line)
    # the per-family verdicts and headline AUCs must be present
    assert "fidelity_ok" in parsed and "layer_ok" in parsed
    assert "auc_ds2" in parsed


def test_selection_is_bounded_even_for_huge_reports():
    """A report with hundreds of keys (e.g. many fewstep candidates)
    must not leak into the line: the selection is a fixed allowlist."""
    fid = {f"fewstep_SamplerX_{i}_classifier_auc": 0.5 for i in range(200)}
    fid.update({f"hgcal_feature_{i}": 0.1 for i in range(100)})
    fid.update({
        "ok": True, "Etot": 0.0, "classifier_auc": 0.45,
        "layer_ok": True, "layer_classifier_auc": 0.69,
        "fewstep_best": "DPMPP2M_36",
        "fewstep_best_showers_per_sec": 350.0,
        "fewstep_DPMPP2M_36_classifier_auc": 0.6,
        "fewstep_best_rel": "DPMPP2M_36",
        "fewstep_best_rel_showers_per_sec": 350.0,
    })
    extras = bench.compact_fidelity_extras(fid)
    assert len(extras) < 30
    line = _line_for(fid)
    assert len(line) < MAX_LINE, len(line)
    assert json.loads(line)["fewstep_best"] == "DPMPP2M_36"
    assert json.loads(line)["fewstep_best_auc"] == 0.6


def test_fewstep_absent_keys_do_not_fabricate():
    extras = bench.compact_fidelity_extras({"ok": False, "Etot": 0.5})
    assert "fewstep_best" not in extras
    assert extras["fidelity_ok"] is False


def test_rounding_keeps_floats_short():
    line = _line_for({"ok": True, "Etot": 1 / 3, "classifier_auc": np.pi})
    assert "0.3333," in line and "3.1416" in line
