"""TRAIN_MICROBATCH gradient accumulation: the scan-accumulated step must
equal manually averaging per-chunk gradients (same per-chunk keys) and
applying one Adam update."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from calodiffusion_tpu.train.trainer import TrainDiffusion
from calodiffusion_tpu.utils.config import default_flags
from tests.utils_test import fake_batch, tiny_ds2_config


@pytest.mark.slow  # train-step compiles (~60s on CPU)
def test_grad_accum_matches_manual_chunking(tmp_path):
    micro = 4
    base = tiny_ds2_config(
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16, NSTEPS=8,
        LOSS_TYPE="mse", TRAIN_MICROBATCH=micro,
    )
    data, E, layers = fake_batch(base, batch=8, seed=3)
    data, E, layers = map(jnp.asarray, (data, E, layers))
    key = jax.random.PRNGKey(5)

    flags = default_flags(checkpoint_folder=str(tmp_path))
    trainer = TrainDiffusion(flags, base, load_data=False, save_model=False)
    trainer.init_model()
    # SGD instead of Adam: Adam's first step is ~sign(g)*lr, infinitely
    # sensitive to near-zero grads, which would turn f32 reassociation
    # noise into 2*lr param flips
    trainer.opt = optax.sgd(1e-2)
    trainer.opt_state = trainer.opt.init(trainer.params)
    step, _ = trainer._make_train_step()
    params0 = jax.tree_util.tree_map(jnp.copy, trainer.params)

    new_params, _, _, loss = step(
        trainer.params, trainer.opt_state, trainer.ema_params, key,
        data, E, layers,
    )

    # expected: per-chunk grads with the same split keys, averaged, one update
    model = trainer.model
    keys = jax.random.split(key, 8 // micro)
    g_sum = None
    l_sum = 0.0
    for i, k in enumerate(keys):
        sl = slice(i * micro, (i + 1) * micro)
        l, g = jax.value_and_grad(
            lambda p: model.compute_loss(
                p, k, data[sl], E[sl], layers=layers[sl]
            )
        )(params0)
        l_sum += l
        g_sum = g if g_sum is None else jax.tree_util.tree_map(
            jnp.add, g_sum, g
        )
    grads = jax.tree_util.tree_map(lambda g: g / len(keys), g_sum)
    expected = jax.tree_util.tree_map(
        lambda p, g: p - 1e-2 * g, params0, grads
    )

    np.testing.assert_allclose(float(loss), float(l_sum) / len(keys),
                               rtol=1e-5)
    flat_new = jax.tree_util.tree_leaves(new_params)
    flat_exp = jax.tree_util.tree_leaves(expected)
    assert len(flat_new) == len(flat_exp)
    for a, b in zip(flat_new, flat_exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)
