"""Size the train-step attention prize: full step with (a) unfused XLA
attention (current production path), (b) no attention at all (ceiling),
(c) fused kernel dispatched in the gradient trace (custom-VJP recompute).

Run: python scripts/train_attn_ab.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import bench
from calodiffusion_tpu.models.diffusion import CaloDiffusion
from calodiffusion_tpu.ops.pallas_linear_attention import training_trace
from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def step_time(config, use_training_trace=True, runs=10, verbose=False):
    model = CaloDiffusion(config, n_steps=400, loss_type="l2")
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    shape = [BATCH] + list(config["SHAPE_PAD"][1:])
    data = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    E = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, 1))
    layers = jax.random.normal(
        jax.random.PRNGKey(3), (BATCH, config["SHAPE_FINAL"][2] + 1))

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.compute_loss(p, key, data, E, layers=layers)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    import contextlib
    ctx = training_trace() if use_training_trace else contextlib.nullcontext()
    with ctx:
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(4))
    jax.block_until_ready(loss)
    if verbose:
        print(f"  warmup loss: {float(loss):.5f}")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(runs):
            params, opt_state, loss = step(
                params, opt_state, jax.random.PRNGKey(5 + i))
        jax.block_until_ready(loss)
        best = min(best, (time.perf_counter() - t0) / runs)
    if verbose:
        print(f"  final loss: {float(loss):.5f}")
    return best


if __name__ == "__main__":
    import tempfile
    enable_compile_cache()
    tmpdir = tempfile.mkdtemp(prefix="ab_")
    cfg = bench._dataset_config("ds2", tmpdir)

    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    if mode in ("all", "prod"):
        t = step_time(dict(cfg), use_training_trace=True, verbose=True)
        print(f"production attention path     : {t*1e3:6.1f} ms")
    if mode in ("all", "noattn"):
        cfg_na = dict(cfg)
        cfg_na["BLOCK_ATTN"] = False
        cfg_na["MID_ATTN"] = False
        t = step_time(cfg_na, use_training_trace=True, verbose=True)
        print(f"no attention (ceiling)        : {t*1e3:6.1f} ms")
    if mode in ("all", "fwdonly"):
        os.environ["CALODIFF_FUSED_ATTN"] = "fwdonly"
        t = step_time(dict(cfg), use_training_trace=True, verbose=True)
        del os.environ["CALODIFF_FUSED_ATTN"]
        print(f"fwdonly (unfused XLA in train): {t*1e3:6.1f} ms")
