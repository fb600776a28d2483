"""Probe: isolate the ds3 full-resolution TRAIN-step compile/run time.

The ds3 fidelity smoke hung >13 min inside its first jitted train step.
This compiles and times one fwd+bwd+Adam step at the shipped ds3 config
(45x50x18, [32,32,32,32], block+mid attention) under each attention
dispatch mode, batch 64, so the hang can be attributed (Pallas bwd kernel
vs XLA chain vs conv gradients).

Run: CALODIFF_FUSED_ATTN=<mode> python scripts/ds3_train_compile_probe.py [--no-attn]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from calodiffusion_tpu.models.diffusion import CaloDiffusion
    from calodiffusion_tpu.ops.pallas_linear_attention import training_trace
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache
    from tests.utils_test import tiny_ds2_config

    enable_compile_cache()
    attn = "--no-attn" not in sys.argv
    batch = int(next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--batch=")), 64))

    cfg = tiny_ds2_config(
        DATASET_NUM=3,
        SHAPE_ORIG=[-1, 40500],
        SHAPE_PAD=[-1, 1, 45, 50, 18],
        SHAPE_FINAL=[-1, 1, 45, 50, 18],
        LAYER_SIZE_UNET=[32, 32, 32, 32], COND_SIZE_UNET=128,
        BLOCK_ATTN=attn, MID_ATTN=attn, COMPRESS_Z=True,
        SHOWERMAP="logit-norm", TIME_EMBED="sigma", NOISE_SCHED="cosine",
        R_Z_INPUT=True, PRECISION="bf16",
    )
    model = CaloDiffusion(cfg, n_steps=400, loss_type="l2")
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0))
    print(f"init: {time.time()-t0:.1f}s", flush=True)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    data = jax.random.normal(jax.random.PRNGKey(1),
                             (batch, 1, 45, 50, 18), jnp.float32)
    E = jax.random.uniform(jax.random.PRNGKey(2), (batch, 1))

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.compute_loss(p, key, data, E, layers=None)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    mode = os.environ.get("CALODIFF_FUSED_ATTN", "default")
    with training_trace():
        t0 = time.time()
        lowered = step.lower(params, opt_state, jax.random.PRNGKey(3))
        print(f"[{mode} attn={attn} b={batch}] lower: {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"[{mode}] compile: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        params, opt_state, loss = compiled(params, opt_state,
                                           jax.random.PRNGKey(3))
        jax.block_until_ready(loss)
        print(f"[{mode}] first run: {time.time()-t0:.1f}s "
              f"loss={float(loss):.4f}", flush=True)
        t0 = time.time()
        for i in range(3):
            params, opt_state, loss = compiled(params, opt_state,
                                               jax.random.PRNGKey(4 + i))
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / 3
        print(f"[{mode}] steady step: {dt*1e3:.1f} ms "
              f"({batch/dt:.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
