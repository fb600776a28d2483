"""Val-loss padding-bias regression (VERDICT round 1, weak #3): padded rows
must not move the loss; mask=None must reduce exactly to the reference
semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calodiffusion_tpu.models.losses import LOSS_REGISTRY

CFG = {"NOISE_SCHED": "log"}


def closed_form_denoise(x, E=None, sigma=None, layers=None):
    return x / (1.0 + sigma**2)


@pytest.mark.parametrize("obj", list(LOSS_REGISTRY))
@pytest.mark.parametrize("loss_type", ["l1", "l2", "mse", "huber"])
def test_masked_loss_ignores_padding(obj, loss_type):
    loss = LOSS_REGISTRY[obj](CFG, n_steps=8, loss_type=loss_type)
    rng = np.random.default_rng(0)
    n_real, n_pad = 5, 3
    data = rng.standard_normal((n_real, 16)).astype(np.float32)
    noise = rng.standard_normal((n_real, 16)).astype(np.float32)
    rnd = rng.standard_normal(n_real).astype(np.float32)
    E = np.ones((n_real, 1), np.float32)

    unpadded = loss(closed_form_denoise, jnp.asarray(data), E,
                    jax.random.PRNGKey(0), noise=jnp.asarray(noise),
                    rnd_normal=jnp.asarray(rnd))

    pad = lambda a: np.concatenate([a, np.repeat(a[-1:], n_pad, 0)])
    mask = jnp.asarray([1.0] * n_real + [0.0] * n_pad)
    padded = loss(closed_form_denoise, jnp.asarray(pad(data)),
                  pad(E), jax.random.PRNGKey(0),
                  noise=jnp.asarray(pad(noise)),
                  rnd_normal=jnp.asarray(np.concatenate([rnd, np.zeros(n_pad, np.float32)])),
                  mask=mask)
    np.testing.assert_allclose(float(unpadded), float(padded), rtol=1e-5)


@pytest.mark.parametrize("loss_type", ["l1", "l2", "mse", "huber"])
def test_mask_none_matches_reference_semantics(loss_type):
    """mask=None paths are byte-identical to round-1 (reference) reductions."""
    loss = LOSS_REGISTRY["hybrid_weight"](CFG, n_steps=8, loss_type=loss_type)
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    weight = jnp.asarray(rng.uniform(0.5, 2.0, (4, 8)).astype(np.float32))

    got = loss.loss(pred, target, weight)
    if loss_type == "l2":
        expect = (weight * (pred - target) ** 2).sum() / (
            jnp.mean(weight) * pred.size
        )
    elif loss_type == "l1":
        expect = jnp.mean(jnp.abs(pred - target))
    elif loss_type == "mse":
        expect = jnp.mean((pred - target) ** 2)
    else:
        err = jnp.abs(pred - target)
        q = jnp.minimum(err, 1.0)
        expect = jnp.mean(0.5 * q**2 + 1.0 * (err - q))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-6)


def test_masked_allones_equals_unmasked():
    loss = LOSS_REGISTRY["hybrid_weight"](CFG, n_steps=8, loss_type="l2")
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    weight = jnp.asarray(rng.uniform(0.5, 2.0, (4, 8)).astype(np.float32))
    np.testing.assert_allclose(
        float(loss.loss(pred, target, weight, mask=jnp.ones(4))),
        float(loss.loss(pred, target, weight)), rtol=1e-5,
    )
