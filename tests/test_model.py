"""Model-level smoke + invariant tests: CondUnet shapes for every shipped
SHAPE_FINAL, denoise/loss finiteness, and short sampler runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calodiffusion_tpu.models.diffusion import CaloDiffusion
from tests.utils_test import fake_batch, tiny_ds2_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_ds2_config()
    model = CaloDiffusion(cfg, n_steps=10, loss_type="l2")
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def test_forward_shape(model_and_params):
    cfg, model, params = model_and_params
    data, E, layers = fake_batch(cfg)
    sigma = jnp.full((4, 1, 1, 1, 1), 0.5)
    out = model.denoise(params, jnp.asarray(data), E=jnp.asarray(E),
                        sigma=sigma, layers=jnp.asarray(layers))
    assert out.shape == data.shape
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("shape_final,compress_Z", [
    ((1, 45, 16, 9), True),    # dataset 2
    ((1, 45, 50, 18), True),   # dataset 3
    ((1, 5, 10, 30), True),    # dataset 1 photons (GLaM grid)
    ((1, 7, 10, 23), True),    # dataset 1 pions (GLaM grid)
    ((1, 28, 12, 21), True),   # HGCal
    ((1, 45, 16, 9), False),
])
def test_unet_shape_roundtrip(shape_final, compress_Z):
    """U-Net output must match input for every shipped geometry: exercises
    the extra_upsample output-padding bookkeeping (reference models.py:621-635)."""
    cfg = tiny_ds2_config(
        SHAPE_PAD=[-1] + list(shape_final),
        SHAPE_FINAL=[-1] + list(shape_final),
        SHAPE_ORIG=[-1, int(np.prod(shape_final))],
        COMPRESS_Z=compress_Z,
        DATASET_NUM=2,
        R_Z_INPUT=False,
    )
    model = CaloDiffusion(cfg, n_steps=5)
    params = model.init(jax.random.PRNGKey(1))
    data, E, layers = fake_batch(cfg, batch=2)
    sigma = jnp.full((2, 1, 1, 1, 1), 1.0)
    out = model.denoise(params, jnp.asarray(data), E=jnp.asarray(E),
                        sigma=sigma, layers=jnp.asarray(layers))
    assert out.shape == data.shape


def test_compute_loss_finite_and_deterministic(model_and_params):
    cfg, model, params = model_and_params
    data, E, layers = fake_batch(cfg)
    key = jax.random.PRNGKey(42)
    l1 = model.compute_loss(params, key, jnp.asarray(data), jnp.asarray(E),
                            layers=jnp.asarray(layers))
    l2 = model.compute_loss(params, key, jnp.asarray(data), jnp.asarray(E),
                            layers=jnp.asarray(layers))
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)


@pytest.mark.slow  # ~30s
def test_loss_gradients_flow(model_and_params):
    cfg, model, params = model_and_params
    data, E, layers = fake_batch(cfg)

    def loss_fn(p):
        return model.compute_loss(p, jax.random.PRNGKey(7), jnp.asarray(data),
                                  jnp.asarray(E), layers=jnp.asarray(layers))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_ddim_sample_runs(model_and_params):
    cfg, model, params = model_and_params
    _, E, layers = fake_batch(cfg, batch=2)
    out = model.sample(params, jax.random.PRNGKey(3), jnp.asarray(E),
                       layers=jnp.asarray(layers), num_steps=10)
    assert out.shape == (2, 1, 45, 16, 9)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # ~80s: two full sampler traces
def test_microbatched_sampling_matches_chunks(model_and_params):
    """SAMPLE_MICROBATCH splits big batches into sequential lax.map chunks
    (the large-batch HBM-cliff fix); results must equal sampling each chunk
    directly with the same split keys."""
    cfg, model, params = model_and_params
    _, E, layers = fake_batch(cfg, batch=8, seed=7)
    E, layers = jnp.asarray(E), jnp.asarray(layers)

    micro_model = CaloDiffusion(dict(cfg, SAMPLE_MICROBATCH=4), n_steps=10)
    key = jax.random.PRNGKey(11)
    out = micro_model.sample(params, key, E, layers=layers, num_steps=10)
    assert out.shape == (8, 1, 45, 16, 9)

    # reproduce by hand: same start-noise draw, same per-chunk keys
    k_start, k_samp = jax.random.split(key)
    start = micro_model.noise_generation(k_start, (8, 1, 45, 16, 9))
    keys = jax.random.split(k_samp, 2)
    sampler = micro_model.make_sampler()
    expected = jnp.concatenate([
        sampler(micro_model, params, start[i * 4:(i + 1) * 4],
                E[i * 4:(i + 1) * 4], layers[i * 4:(i + 1) * 4],
                10, 0, keys[i], False)
        for i in range(2)
    ])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5
    )


def test_microbatch_disabled_for_indivisible_batch(model_and_params):
    cfg, model, params = model_and_params
    _, E, layers = fake_batch(cfg, batch=6, seed=8)
    micro_model = CaloDiffusion(dict(cfg, SAMPLE_MICROBATCH=4), n_steps=10)
    out = micro_model.sample(params, jax.random.PRNGKey(1), jnp.asarray(E),
                             layers=jnp.asarray(layers), num_steps=10)
    assert out.shape == (6, 1, 45, 16, 9)
    assert np.all(np.isfinite(np.asarray(out)))
