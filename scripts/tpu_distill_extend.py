"""Extend a fewstep run's consistency distillation and re-measure.

Round 4 recorded the distilled students failing the fidelity gate at the
25.6k-step budget (fewstep_Consistency_* rows).  This script resumes the
SAME student from its Orbax checkpoint for additional epochs and
re-evaluates Consistency sampling — one more point on the
distillation-budget axis, so "fails at budget X" becomes a measured
scaling statement instead of a single point.

Usage: python scripts/tpu_distill_extend.py [--workdir=/tmp/fewstep_X]
         [--to-epochs=N] [--steps=4]
Appends results to docs/distill_scaling.json (+ prints them).
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import h5py
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    import tpu_fidelity_check as fid
    from calodiffusion_tpu.data.loader import load_data
    from calodiffusion_tpu.train import checkpoint as ckpt_io
    from calodiffusion_tpu.train.train_distill import TrainDistillation
    from calodiffusion_tpu.utils.config import default_flags
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    workdir = next((a.split("=", 1)[1] for a in sys.argv
                    if a.startswith("--workdir=")), "/tmp/fewstep_r4big")
    to_epochs = next((int(a.split("=", 1)[1]) for a in sys.argv
                      if a.startswith("--to-epochs=")), 200)
    steps_list = next((a.split("=", 1)[1] for a in sys.argv
                       if a.startswith("--steps=")), "4,2")
    steps_list = [int(s) for s in steps_list.split(",")]

    cd_dir = glob.glob(os.path.join(workdir, "ckpt_cd", "*"))[0]
    with open(os.path.join(cd_dir, "config.json")) as f:
        dcfg = json.load(f)
    dcfg["MAXEPOCH"] = to_epochs

    teacher_ckpt = glob.glob(os.path.join(workdir, "ckpt", "*",
                                          "final.ckpt"))[0]
    arrays, host = ckpt_io.load_checkpoint(
        os.path.dirname(teacher_ckpt), "final"
    )
    teacher = ckpt_io.inference_params(arrays, host)

    distiller = TrainDistillation(
        default_flags(data_folder=workdir,
                      checkpoint_folder=os.path.join(workdir, "ckpt_cd"),
                      load=True),
        dcfg, teacher_params=teacher,
    )
    model, _ = distiller.train()   # resumes from checkpoint.ckpt
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
    for n in steps_list:
        eval_loader, _ = load_data(default_flags(data_folder=workdir),
                                   dcfg, eval=True)
        gen, en = model.generate(student, jax.random.PRNGKey(0),
                                 eval_loader, sample_steps=n,
                                 sampler=sampler)
        seps = fid.compute_seps(ref, ref_e, gen, en, dcfg, workdir)
        tag = f"epochs{to_epochs}_Consistency_{n}"
        results[tag] = {k: float(v) for k, v in seps.items()}
        print(f"[{tag}] auc={seps.get('classifier_auc', float('nan')):.3f} "
              f"fpd={seps.get('fpd', float('nan')):.3f}", flush=True)
        # incremental write: a timed-out run keeps its measured points
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
