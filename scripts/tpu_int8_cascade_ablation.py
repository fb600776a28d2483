"""Per-conv int8 ablation on the trained cascade (VERDICT r4 item #4).

Round 3 measured the cascade (two-stage LayerDiffusion) as the one family
where W8A8 int8 sampling breaks fidelity: +0.13 classifier AUC and ~10x
JSD over the bf16 cascade, while every other family pays ~0.01-0.02 AUC.
This script localizes the damage to conv groups of the stage-2 shower
U-Net (stage 1 is a dense ResNet — no quantized convs) by generating from
the SAME trained cascade weights with chosen conv groups excluded from
the int8 scales table (an excluded conv dispatches bf16; see
ops/quant.scale_for and QUANT_INT8_EXCLUDE in models/diffusion.py).

Needs a completed `tpu_fidelity_families.py layer` run: its tempdir
(/tmp/fid_layer_*) holds the trained base + layer checkpoints and the
synthetic eval set.  Usage:

    python scripts/tpu_int8_cascade_ablation.py [--workdir=/tmp/fid_layer_X]
        [--groups=coarse|fine] [--events=N]

Writes the measured table to docs/INT8_CASCADE.md and the winning
exclusion (if any passes the gate) is meant to ship as
QUANT_INT8_EXCLUDE in the cascade path.
"""

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def find_workdir():
    for a in sys.argv:
        if a.startswith("--workdir="):
            return a.split("=", 1)[1]
    cands = sorted(glob.glob("/tmp/fid_layer_*"), key=os.path.getmtime,
                   reverse=True)
    for c in cands:
        if glob.glob(os.path.join(c, "ckpt", "*", "final.ckpt")):
            return c
    raise SystemExit("no completed /tmp/fid_layer_* workdir found; run "
                     "scripts/tpu_fidelity_families.py layer first")


def conv_groups(table, n_res, mode="coarse"):
    """Partition the calibrated scales table into named conv groups.

    U-Net module numbering (flax occurrence order, models/nn_modules.py):
    ResnetBlock_{0..2R-1} = down path, {2R, 2R+1} = mid,
    {2R+2..4R+1} = up path, {4R+2} = final block;
    CondUnet_0/Conv3d_{0..R-2} = the downsample strided convs."""
    down_end = 2 * n_res
    up_start = 2 * n_res + 2

    def which(path):
        m = re.search(r"ResnetBlock_(\d+)", path)
        if m:
            i = int(m.group(1))
            if i < down_end:
                lvl = i // 2
                return ("down", f"down{lvl}")
            if i < up_start:
                return ("mid", "mid")
            if i < up_start + 2 * n_res:
                lvl = (i - up_start) // 2
                return ("up", f"up{lvl}")
            return ("final_block", "final_block")
        m = re.search(r"CondUnet_\d+/Conv3d_(\d+)$", path)
        if m:  # strided downsample conv after level int(m.group(1))
            return ("down", f"downsample{m.group(1)}")
        return ("other", "other")

    groups = {}
    for path in table:
        coarse, fine = which(path)
        key = coarse if mode == "coarse" else fine
        groups.setdefault(key, []).append(path)
    return groups


def main():
    import jax

    from calodiffusion_tpu.data.loader import load_data
    from calodiffusion_tpu.train.train_layer_model import TrainLayerModel
    from calodiffusion_tpu.utils.config import default_flags
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache
    from scripts.tpu_fidelity_families import separations

    enable_compile_cache()

    tmp = find_workdir()
    print(f"workdir: {tmp}", flush=True)
    base_ckpt = glob.glob(os.path.join(tmp, "ckpt", "*", "final.ckpt"))[0]
    layer_ckpt = glob.glob(
        os.path.join(tmp, "ckpt_layer", "*", "final.ckpt")
    )[0]
    with open(os.path.join(os.path.dirname(base_ckpt), "config.json")) as f:
        cfg = json.load(f)

    n_events = next((int(a.split("=", 1)[1]) for a in sys.argv
                     if a.startswith("--events=")), None)
    mode = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--groups=")), "coarse")

    inf_cfg = dict(cfg, layer_model=layer_ckpt)
    inf = TrainLayerModel(
        default_flags(data_folder=tmp, model_loc=base_ckpt),
        inf_cfg, load_data=False, save_model=False, inference=True,
    )
    model, params = inf.load_for_inference()

    with h5py.File(os.path.join(tmp, "dataset_2_2.hdf5"), "r") as f:
        ref = f["showers"][:].astype(np.float32) * 0.001
        ref_e = f["incident_energies"][:].astype(np.float32) * 0.001
    if n_events:
        ref, ref_e = ref[:n_events], ref_e[:n_events]

    def gen_and_score(tag, scales):
        """Generate the full eval set with the given int8 scales table
        (None = bf16) and score vs the Geant reference."""
        eval_loader, _ = load_data(default_flags(data_folder=tmp), inf_cfg,
                                   eval=True)
        model.config["QUANT_INT8"] = scales is not None
        model._int8_scales = scales
        t0 = time.time()
        gen, gen_e = model.generate(
            params, jax.random.PRNGKey(0), eval_loader, sample_steps=400,
        )
        if n_events:
            gen, gen_e = gen[:n_events], gen_e[:n_events]
        seps = separations(ref, ref_e, gen, gen_e.reshape(-1),
                           nlayer_axis=45)
        model.config["QUANT_INT8"] = False
        print(
            f"[{tag}] auc={seps.get('classifier_auc', float('nan')):.3f} "
            f"jsd={seps.get('classifier_jsd', float('nan')):.3f} "
            f"fpd={seps.get('fpd', float('nan')):.3f} "
            f"Etot={seps['Etot']:.4f} ({time.time()-t0:.0f}s)",
            flush=True,
        )
        return seps

    results = {}

    def flush_results():
        """Incremental write: a truncated run still records everything
        measured so far (the r3 lesson: machinery without a recorded
        result doesn't count)."""
        out = os.path.join(ROOT, "docs", "INT8_CASCADE.md")
        with open(out, "w") as f:
            f.write(
                "# int8 cascade ablation (scripts/tpu_int8_cascade_"
                "ablation.py)\n\nTrained cascade weights from a "
                "`tpu_fidelity_families.py layer` run; every row "
                "generates the full synthetic eval set at 400-step DDIM "
                "from the SAME weights, varying only which stage-2 U-Net "
                "convs run W8A8 int8 (`excl_G` = group G restored to "
                "bf16; `only_G` = group G alone int8; `w8a16_all` = "
                "weights int8, activations float).  Gate: classifier "
                "AUC <= 0.70, FPD <= 1.0.\n\n"
                "| variant | AUC | JSD | FPD | Etot sep |\n"
                "|---|---|---|---|---|\n"
            )
            for tag, s in results.items():
                f.write(
                    f"| {tag} | {s.get('classifier_auc', float('nan')):.3f} "
                    f"| {s.get('classifier_jsd', float('nan')):.3f} "
                    f"| {s.get('fpd', float('nan')):.3f} "
                    f"| {s['Etot']:.4f} |\n"
                )
        with open(os.path.join(ROOT, "docs", "int8_cascade_ablation.json"),
                  "w") as f:
            json.dump({k: {kk: float(vv) for kk, vv in v.items()}
                       for k, v in results.items()}, f, indent=1)

    results["bf16"] = gen_and_score("bf16", None)
    flush_results()

    # full int8: calibrate once on the real conditioning (the same path
    # generate() uses lazily) and keep the full table around for variants
    model.config["QUANT_INT8"] = True
    model._int8_scales = None
    eval_loader, _ = load_data(default_flags(data_folder=tmp), inf_cfg,
                               eval=True)
    E0, lay0, _ = next(iter(eval_loader))
    m = min(32, len(E0))
    samp = model.sample_layers(params, jax.random.PRNGKey(1),
                               np.asarray(E0)[:m])
    import jax.numpy as jnp
    full_table = model.prepare_int8(
        params,
        E=jnp.concatenate([jnp.asarray(E0)[:m]] * 2, axis=0),
        layers=jnp.concatenate(
            [jnp.asarray(lay0, jnp.float32)[:m], samp], axis=0
        ),
    )
    model.config["QUANT_INT8"] = False
    print(f"calibrated {len(full_table)} convs", flush=True)

    results["int8_full"] = gen_and_score("int8_full", dict(full_table))
    flush_results()

    # W8A16: int8-dequantized weights, float activations — if this is
    # clean, the damage is ACTIVATION quantization (static scales /
    # saturation), not the weight grid
    from calodiffusion_tpu.ops import quant
    results["w8a16_all"] = gen_and_score(
        "w8a16_all", {p: quant.WEIGHT_ONLY for p in full_table}
    )
    flush_results()

    n_res = len(cfg["LAYER_SIZE_UNET"]) - 1
    groups = conv_groups(full_table, n_res, mode=mode)
    print("groups:", {k: len(v) for k, v in groups.items()}, flush=True)

    # single-group EXCLUSION: which group's bf16 restoration helps most?
    for gname in sorted(groups):
        scales = {p: v for p, v in full_table.items()
                  if p not in set(groups[gname])}
        results[f"excl_{gname}"] = gen_and_score(f"excl_{gname}", scales)
        flush_results()

    # single-group ONLY-quantized (inverse): which group alone breaks it?
    for gname in sorted(groups):
        scales = {p: v for p, v in full_table.items()
                  if p in set(groups[gname])}
        results[f"only_{gname}"] = gen_and_score(f"only_{gname}", scales)
        flush_results()

    print("wrote docs/INT8_CASCADE.md", flush=True)


if __name__ == "__main__":
    main()
