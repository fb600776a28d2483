"""Ablation profile of the ds2 denoise step on the real TPU.

Times a single jitted denoise call for several model variants to locate
the latency (attention, cylindrical wrap, conditioning images, precision).
Usage: python scripts/profile_step.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from calodiffusion_tpu.models.diffusion import CaloDiffusion

BASE = {
    "DATASET_NUM": 2,
    "SHAPE_ORIG": [-1, 6480],
    "SHAPE_PAD": [-1, 1, 45, 16, 9],
    "SHAPE_FINAL": [-1, 1, 45, 16, 9],
    "LAYER_SIZE_UNET": [32, 32, 64, 32],
    "COND_SIZE_UNET": 128,
    "BLOCK_ATTN": True, "MID_ATTN": True, "COMPRESS_Z": True,
    "CYLINDRICAL": True,
    "SHOWERMAP": "layer-logit-norm", "R_Z_INPUT": True,
    "NOISE_SCHED": "log", "NSTEPS": 400,
    "TRAINING_OBJ": "hybrid_weight", "LOSS_TYPE": "l2",
    "TIME_EMBED": "log", "COND_EMBED": "id", "SHOWER_EMBED": "",
    "ECUT": 0.0000151, "EMAX": 1000.0, "EMIN": 1.0, "logE": True,
    "MAXDEP": 2, "CHECKPOINT_NAME": "prof", "PRECISION": "bf16",
}


def time_variant(name, overrides, batch):
    cfg = dict(BASE, **overrides)
    model = CaloDiffusion(cfg, n_steps=400)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 1, 45, 16, 9))
    E = jnp.full((batch, 1), 0.5)
    layers = jnp.zeros((batch, 46))
    sigma = jnp.full((batch, 1, 1, 1, 1), 1.0)

    fn = jax.jit(lambda p, x: model.denoise(p, x, E=E, sigma=sigma,
                                            layers=layers))
    out = fn(params, x)
    jax.block_until_ready(out)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(params, out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s}: {dt*1000:7.2f} ms/step")
    return dt


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(f"batch={batch}")
    time_variant("full (bf16)", {}, batch)
    time_variant("no attention", {"BLOCK_ATTN": False, "MID_ATTN": False}, batch)
    time_variant("no cylindrical", {"CYLINDRICAL": False}, batch)
    time_variant("no RZ images", {"R_Z_INPUT": False}, batch)
    time_variant("no compress_Z", {"COMPRESS_Z": False}, batch)
    time_variant("f32", {"PRECISION": "f32"}, batch)
