"""Multi-seed statistics for the cascade fidelity gate (VERDICT r4 #4).

The round-4 cascade pass was a single run at a 0.004 margin (AUC 0.696 vs
the <=0.70 gate) on a metric with a measured ~±0.05 run-to-run band.  This
harness reruns the EXACT passing recipe (200-epoch base + EMA + SWA tail,
32768 events, scripts/tpu_fidelity_families.layer_family) across seeds and
records mean ± a t-based 95% CI so the gate becomes a statement about the
recipe, not one draw.

Run: python scripts/tpu_cascade_seeds.py [--seeds 1,2,3] [--epochs 200]
     [--events 32768]

Each seed's row is appended to docs/cascade_seeds.json IMMEDIATELY after it
finishes (a timed-out run keeps its measured seeds).  The aggregate over
all recorded seeds (including the round-4 seed-1234 run, pre-seeded into
the json) lands in fidelity_report.json as layer_seed_* keys, and
layer_seeds_ok gates on the MEAN AUC/FPD.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

OUT = os.path.join(ROOT, "docs", "cascade_seeds.json")
REPORT = os.path.join(ROOT, "fidelity_report.json")


def main():
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    import tpu_fidelity_families as fam

    seeds = [int(s) for s in next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--seeds=")),
        "1,2,3",
    ).split(",")]
    epochs = int(next((a.split("=", 1)[1] for a in sys.argv
                       if a.startswith("--epochs=")), 200))
    events = next((a.split("=", 1)[1] for a in sys.argv
                   if a.startswith("--events=")), "32768")

    rows = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)

    for seed in seeds:
        tag = f"seed{seed}"
        if tag in rows:
            print(f"[{tag}] already recorded, skipping", flush=True)
            continue
        # layer_family reads --seed/--events/--swa from sys.argv via
        # train_seed()/parse_flag_value/swa_overrides — the exact r4 recipe
        sys.argv = [sys.argv[0], "--seed", str(seed), "--events", events,
                    "--swa"]
        t0 = time.time()
        seps, _dump = fam.layer_family(epochs)
        row = {k: float(v) for k, v in seps.items()}
        row["wall_s"] = round(time.time() - t0, 1)
        row["epochs"] = epochs
        row["events"] = int(events)
        rows[tag] = row
        with open(OUT, "w") as f:  # incremental: keep finished seeds
            json.dump(rows, f, indent=1)
        print(f"[{tag}] auc={row.get('classifier_auc', float('nan')):.3f} "
              f"fpd={row.get('fpd', float('nan')):.3f} "
              f"({row['wall_s']:.0f}s)", flush=True)

    aucs = np.array([r["classifier_auc"] for r in rows.values()
                     if "classifier_auc" in r])
    fpds = np.array([r["fpd"] for r in rows.values() if "fpd" in r])
    n = len(aucs)
    if n >= 2:
        # t-based 95% half-width (n<=6, so the normal quantile is too tight)
        from scipy import stats

        tq = stats.t.ppf(0.975, n - 1)
        auc_ci = tq * aucs.std(ddof=1) / np.sqrt(n)
        fpd_ci = tq * fpds.std(ddof=1) / np.sqrt(n)
    else:
        auc_ci = fpd_ci = float("nan")

    report = {}
    if os.path.exists(REPORT):
        with open(REPORT) as f:
            report = json.load(f)
    report["layer_seed_n"] = int(n)
    report["layer_seed_auc_mean"] = round(float(aucs.mean()), 4)
    report["layer_seed_auc_ci95"] = round(float(auc_ci), 4)
    report["layer_seed_fpd_mean"] = round(float(fpds.mean()), 4)
    report["layer_seed_fpd_ci95"] = round(float(fpd_ci), 4)
    # the statistical gate: the RECIPE passes if the mean passes
    report["layer_seeds_ok"] = bool(aucs.mean() <= 0.70 and fpds.mean() <= 1.0)
    with open(REPORT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"cascade over {n} seeds: AUC {aucs.mean():.4f} ± {auc_ci:.4f} "
          f"(95% CI), FPD {fpds.mean():.4f} ± {fpd_ci:.4f}; "
          f"layer_seeds_ok={report['layer_seeds_ok']}", flush=True)


if __name__ == "__main__":
    main()
