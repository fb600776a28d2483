"""Alternative consistency-distillation recipe point (VERDICT r4 #5).

The shipped distiller already uses the Heun-teacher PF-ODE step and an EMA
target network (train/train_distill.py), so the recorded "fails at budget
X" scaling points all share one recipe axis: a 100-point sigma grid with
target decay 0.95.  This script trains ONE variant student from the SAME
teacher/workdir — a coarse 18-point grid (matching the few-step sampler's
regime, the iCT-style change arXiv:2310.14189 recommends when the sampler
uses very few steps) with a slower target EMA (0.999) — and records
Consistency@{2,4} rows so "needs a different recipe" cites a measured
attempt instead of a hypothesis.

Usage: python scripts/tpu_distill_variant.py [--workdir=/tmp/fewstep_r4big]
         [--epochs=50] [--nsteps=18] [--decay=0.999]
Appends rows to docs/distill_scaling.json.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import h5py

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def arg(name, default, cast):
    return cast(next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith(f"--{name}=")), default))


def main():
    import jax

    import tpu_fidelity_check as fid
    from calodiffusion_tpu.data.loader import load_data
    from calodiffusion_tpu.train import checkpoint as ckpt_io
    from calodiffusion_tpu.train.train_distill import TrainDistillation
    from calodiffusion_tpu.utils.config import default_flags
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    workdir = arg("workdir", "/tmp/fewstep_r4big", str)
    epochs = arg("epochs", 50, int)
    nsteps = arg("nsteps", 18, int)
    decay = arg("decay", 0.999, float)

    teacher_ckpt = glob.glob(os.path.join(workdir, "ckpt", "*",
                                          "final.ckpt"))[0]
    with open(os.path.join(os.path.dirname(teacher_ckpt),
                           "config.json")) as f:
        cfg = json.load(f)
    arrays, host = ckpt_io.load_checkpoint(
        os.path.dirname(teacher_ckpt), "final"
    )
    teacher = ckpt_io.inference_params(arrays, host)

    tag_base = f"variant_n{nsteps}_d{decay}_e{epochs}"
    dcfg = dict(
        cfg, MAXEPOCH=epochs, CHECKPOINT_NAME=f"fewstep_cd_{tag_base}",
        DISTILL_LR=1e-4, CONSIS_NSTEPS=nsteps, DISTILL_TARGET_DECAY=decay,
    )
    distiller = TrainDistillation(
        default_flags(data_folder=workdir,
                      checkpoint_folder=os.path.join(
                          workdir, f"ckpt_cd_{tag_base}"),
                      load=True),  # crash-resumable
        dcfg, teacher_params=teacher,
    )
    model, _ = distiller.train()
    student = distiller.ema_params

    with h5py.File(os.path.join(workdir, "dataset_2_2.hdf5"), "r") as f:
        ref = f["showers"][:] * 0.001
        ref_e = f["incident_energies"][:] * 0.001

    out_path = os.path.join(ROOT, "docs", "distill_scaling.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    sampler = model.make_sampler("Consistency")
    for n in (4, 2):
        eval_loader, _ = load_data(default_flags(data_folder=workdir),
                                   dcfg, eval=True)
        gen, en = model.generate(student, jax.random.PRNGKey(0),
                                 eval_loader, sample_steps=n,
                                 sampler=sampler)
        seps = fid.compute_seps(ref, ref_e, gen, en, dcfg, workdir)
        tag = f"{tag_base}_Consistency_{n}"
        results[tag] = {k: float(v) for k, v in seps.items()}
        results[tag]["source"] = (
            f"tpu_distill_variant.py: coarse {nsteps}-pt sigma grid, "
            f"target decay {decay}, {epochs} epochs from the same teacher"
        )
        print(f"[{tag}] auc={seps.get('classifier_auc', float('nan')):.3f} "
              f"fpd={seps.get('fpd', float('nan')):.3f}", flush=True)
        with open(out_path, "w") as f:  # incremental
            json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
