"""Benchmark harness: dataset-2 shower generation throughput on one chip.

Primary metric (BASELINE.md): generated showers/sec/chip at 400-step DDIM
sampling on the dataset-2 geometry, versus the PyTorch reference running on
CPU (measured once via bench_baselines/reference_torch.py and cached).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def measure_ours(batch: int, num_steps: int, runs: int = 3) -> float:
    import jax

    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from calodiffusion_tpu.models.diffusion import CaloDiffusion

    config = {
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
        "SAMPLER": "DDim",
        "ECUT": 0.0000151, "EMAX": 1000.0, "EMIN": 1.0, "logE": True,
        "MAXDEP": 2,
        "CHECKPOINT_NAME": "bench",
        "PRECISION": os.environ.get("BENCH_PRECISION", "bf16"),
    }
    model = CaloDiffusion(config, n_steps=num_steps, loss_type="l2")
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    sampler = model.make_sampler()

    E = jnp.asarray(jax.random.uniform(jax.random.PRNGKey(1), (batch, 1)))
    layers = jnp.asarray(jax.random.normal(jax.random.PRNGKey(2), (batch, 46)))

    fn = jax.jit(
        lambda p, k: model.sample(
            p, k, E, layers=layers, num_steps=num_steps, sampler=sampler
        )
    )

    log(f"compiling + warmup (batch={batch}, steps={num_steps}, "
        f"precision={config['PRECISION']}) ...")
    t0 = time.perf_counter()
    out = fn(params, jax.random.PRNGKey(3))
    jax.block_until_ready(out)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(runs):
        k = jax.random.PRNGKey(10 + i)
        t0 = time.perf_counter()
        out = fn(params, k)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"run times: {['%.3f' % t for t in times]}")
    return batch / best


def main():
    num_steps = int(os.environ.get("BENCH_STEPS", 400))
    batch = int(os.environ.get("BENCH_BATCH", 128))

    ours = measure_ours(batch, num_steps)
    log(f"ours: {ours:.2f} showers/sec @ {num_steps}-step DDIM")

    try:
        from bench_baselines.reference_torch import measure_reference_cpu

        baseline = measure_reference_cpu()
        log(f"reference torch-CPU: {baseline:.3f} showers/sec @400-step DDIM")
    except Exception as e:  # baseline machine may lack reference checkout
        log(f"baseline measurement failed ({e}); using cached/NaN")
        baseline = float("nan")

    vs = ours / baseline if baseline == baseline and baseline > 0 else float("nan")
    print(json.dumps({
        "metric": "ds2_showers_per_sec_per_chip_400step_ddim",
        "value": round(ours, 3),
        "unit": "showers/sec/chip",
        "vs_baseline": round(vs, 3) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
