"""Measure the PyTorch reference's CPU sampling throughput (the baseline).

Imports the actual reference package from /root/reference (read-only) with
lightweight stubs for its optional deps (mplhep, torchsde) that are absent
here, builds the dataset-2 model with random weights, and times DDIM
sampling on CPU.  The per-step cost is uniform, so a short run extrapolates
to the 400-step setting.  The result is cached in
``bench_baseline_cache.json`` so the full bench doesn't re-measure it.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

CACHE = os.path.join(os.path.dirname(__file__), "..", "bench_baseline_cache.json")
REFERENCE_ROOT = os.environ.get("CALODIF_REFERENCE_ROOT", "/root/reference")


def _stub_missing_modules():
    if "mplhep" not in sys.modules:
        hep = types.ModuleType("mplhep")
        hep.style = types.SimpleNamespace(CMS=None, use=lambda *a, **k: None)
        hep.cms = types.SimpleNamespace(text=lambda *a, **k: None)
        sys.modules["mplhep"] = hep
    if "torchsde" not in sys.modules:
        sde = types.ModuleType("torchsde")
        sde.BrownianTree = object
        sys.modules["torchsde"] = sde
    if "HGCalShowers" not in sys.modules:
        pkg = types.ModuleType("HGCalShowers")
        geo = types.ModuleType("HGCalShowers.HGCalGeo")

        class HGCalGeo:  # placeholder; ds2 benchmark never loads a geometry
            pass

        geo.HGCalGeo = HGCalGeo
        pkg.HGCalGeo = geo
        sys.modules["HGCalShowers"] = pkg
        sys.modules["HGCalShowers.HGCalGeo"] = geo


def _ds2_config():
    return {
        "FILES": [], "EVAL": [], "BIN_FILE": "", "DATASET_NUM": 2,
        "SHAPE_ORIG": [-1, 6480],
        "SHAPE_PAD": [-1, 1, 45, 16, 9],
        "SHAPE_FINAL": [-1, 1, 45, 16, 9],
        "BATCH": 32, "LR": 4e-4,
        "LAYER_SIZE_UNET": [32, 32, 64, 32],
        "COND_SIZE_UNET": 128,
        "BLOCK_ATTN": True, "MID_ATTN": True, "COMPRESS_Z": True,
        "EMAX": 1000.0, "EMIN": 1.0, "ECUT": 0.0000151, "logE": True,
        "MAXDEP": 2, "CYLINDRICAL": True,
        "SHOWERMAP": "layer-logit-norm", "R_Z_INPUT": True,
        "NOISE_SCHED": "log", "NSTEPS": 400,
        "TRAINING_OBJ": "hybrid_weight", "LOSS_TYPE": "l2",
        "TIME_EMBED": "log", "COND_EMBED": "id", "SHOWER_EMBED": "",
        "CHECKPOINT_NAME": "bench_baseline",
    }


def measure_reference_cpu(
    batch: int = 8, steps_timed: int = 20, force: bool = False
) -> float:
    """Returns reference CPU throughput in showers/sec at 400-step DDIM."""
    cache_path = os.path.abspath(CACHE)
    if not force and os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)["ref_cpu_showers_per_sec_400step"]

    _stub_missing_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import torch

    torch.manual_seed(0)
    from calodiffusion.models.calodiffusion import CaloDiffusion  # noqa: E402

    config = _ds2_config()
    model = CaloDiffusion(config, n_steps=400, loss_type="l2")
    model.eval()

    E = torch.rand(batch, 1)
    layers = torch.randn(batch, 46)
    sampler = model.sampler_algorithm
    start = torch.randn(batch, 1, 45, 16, 9)

    with torch.no_grad():
        # warmup a couple of steps
        sampler(model, start, E, layers, 2, 0, False)
        t0 = time.perf_counter()
        sampler(model, start, E, layers, steps_timed, 0, False)
        dt = time.perf_counter() - t0

    per_step = dt / steps_timed
    showers_per_sec_400 = batch / (per_step * 400)
    with open(cache_path, "w") as f:
        json.dump(
            {
                "ref_cpu_showers_per_sec_400step": showers_per_sec_400,
                "batch": batch,
                "steps_timed": steps_timed,
                "sec_per_unet_step": per_step,
            },
            f, indent=2,
        )
    return showers_per_sec_400


if __name__ == "__main__":
    v = measure_reference_cpu(force="--force" in sys.argv)
    print(f"reference CPU: {v:.3f} showers/sec @400-step DDIM")
