"""Regate W8A8 int8 sampling on a trained single-stage ds2 model with the
down-path exclusion fence (docs/INT8_CASCADE.md).

Context: the cascade ablation measured down-path ACTIVATION quantization
as the int8 fidelity failure and shipped QUANT_INT8_EXCLUDE for cascade
configs.  The round-4 fewstep run then showed the same signature on the
SINGLE-stage ds2 model once the teacher is well-trained (bf16 400-step
AUC 0.679 -> int8 0.818): a well-calibrated near-threshold occupancy law
is precisely what static activation scales damage.  This script loads
the fewstep teacher checkpoint and generates the same eval set with
int8 + the down-path fence, recording whether the fence restores the
single-stage gate too.

Usage: python scripts/tpu_int8_fence_regate.py [--workdir=/tmp/fewstep_X]
Appends the measured row to docs/INT8_CASCADE.md and
docs/int8_fence_regate.json.
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
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import default_flags
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    workdir = next((a.split("=", 1)[1] for a in sys.argv
                    if a.startswith("--workdir=")), "/tmp/fewstep_r4big")
    ckpt = glob.glob(os.path.join(workdir, "ckpt", "*", "final.ckpt"))[0]
    with open(os.path.join(os.path.dirname(ckpt), "config.json")) as f:
        cfg = json.load(f)

    with h5py.File(os.path.join(workdir, "dataset_2_2.hdf5"), "r") as f:
        ref = f["showers"][:] * 0.001
        ref_e = f["incident_energies"][:] * 0.001

    results = {}
    n_res = len(cfg["LAYER_SIZE_UNET"]) - 1
    for tag, exclude in (
        ("int8_fenced", [f"ResnetBlock_{i}/" for i in range(2 * n_res)]
         + [f"CondUnet_0/Conv3d_{i}" for i in range(n_res - 1)]),
    ):
        c = dict(cfg, QUANT_INT8=True, QUANT_INT8_EXCLUDE=exclude)
        inf = TrainDiffusion(
            default_flags(data_folder=workdir, model_loc=ckpt),
            c, load_data=False, save_model=False,
        )
        model, params = inf.load_for_inference()
        eval_loader, _ = load_data(default_flags(data_folder=workdir), c,
                                   eval=True)
        gen, en = model.generate(params, jax.random.PRNGKey(0), eval_loader,
                                 sample_steps=400)
        seps = fid.compute_seps(ref, ref_e, gen, en, c, workdir)
        results[tag] = {k: float(v) for k, v in seps.items()}
        print(f"[{tag}] auc={seps.get('classifier_auc', float('nan')):.3f} "
              f"fpd={seps.get('fpd', float('nan')):.3f} "
              f"Etot={seps['Etot']:.4f}", flush=True)

    with open(os.path.join(ROOT, "docs", "int8_fence_regate.json"), "w") as f:
        json.dump(results, f, indent=1)
    with open(os.path.join(ROOT, "docs", "INT8_CASCADE.md"), "a") as f:
        f.write(
            "\n## Single-stage ds2 at high teacher quality "
            "(scripts/tpu_int8_fence_regate.py)\n\n"
            "The 32768-event SWA teacher (fewstep run) measured bf16 "
            "400-step AUC 0.679 but unfenced int8 0.818 — the same "
            "down-path activation signature as the cascade.  With the "
            "down-path fence:\n\n"
            "| variant | AUC | FPD | Etot sep |\n|---|---|---|---|\n"
            + "".join(
                f"| {t} | {r.get('classifier_auc', float('nan')):.3f} "
                f"| {r.get('fpd', float('nan')):.3f} "
                f"| {r['Etot']:.4f} |\n"
                for t, r in results.items()
            )
        )
    print("appended docs/INT8_CASCADE.md", flush=True)


if __name__ == "__main__":
    main()
