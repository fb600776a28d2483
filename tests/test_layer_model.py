"""Layer-energy cascade model tests (LayerDiffusion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calodiffusion_tpu.models.layerdiffusion import LayerDiffusion
from tests.utils_test import fake_batch, tiny_ds2_config


@pytest.fixture(scope="module")
def layer_model():
    cfg = tiny_ds2_config(
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        LAYER_STEPS=4, NSTEPS=4,
    )
    model = LayerDiffusion(cfg, n_steps=4, loss_type="l2")
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def test_param_structure(layer_model):
    cfg, model, params = layer_model
    assert set(params.keys()) == {"base_model", "layer_model"}


def test_layer_loss_only_trains_layer_net(layer_model):
    cfg, model, params = layer_model
    data, E, layers = fake_batch(cfg)
    model.set_layer_state(True)

    def loss_fn(p):
        return model.compute_loss(p, jax.random.PRNGKey(1), jnp.asarray(data),
                                  jnp.asarray(E), layers=jnp.asarray(layers))

    grads = jax.grad(loss_fn)(params)
    g_layer = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["layer_model"])
    )
    g_base = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["base_model"])
    )
    assert g_layer > 0
    assert g_base == 0  # base model untouched in layer-training mode
    model.set_layer_state(False)


@pytest.mark.slow  # ~30s
def test_base_loss_trains_base_net(layer_model):
    cfg, model, params = layer_model
    data, E, layers = fake_batch(cfg)
    model.set_layer_state(False)

    def loss_fn(p):
        return model.compute_loss(p, jax.random.PRNGKey(1), jnp.asarray(data),
                                  jnp.asarray(E), layers=jnp.asarray(layers))

    grads = jax.grad(loss_fn)(params)
    g_base = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["base_model"])
    )
    assert g_base > 0


def test_two_stage_sampling(layer_model):
    cfg, model, params = layer_model
    _, E, _ = fake_batch(cfg, batch=2)
    out = model.sample(params, jax.random.PRNGKey(2), jnp.asarray(E),
                       layers=None, num_steps=4, return_layers=True)
    assert out["x"].shape == (2, 1, 45, 16, 9)
    assert np.asarray(out["layers"]).shape == (2, 46)
    assert np.all(np.isfinite(out["x"]))
    assert np.all(np.isfinite(np.asarray(out["layers"])))


def test_sample_with_given_layers_skips_stage1(layer_model, monkeypatch):
    """Providing ``layers`` must bypass the layer-energy sampler entirely
    (the oracle-layers diagnostic) and condition stage 2 on the given
    vector verbatim."""
    cfg, model, params = layer_model
    _, E, layers = fake_batch(cfg, batch=2)

    def boom(*a, **k):
        raise AssertionError("stage-1 sampler must not run")

    monkeypatch.setattr(model, "sample_layers", boom)
    out = model.sample(params, jax.random.PRNGKey(2), jnp.asarray(E),
                       layers=jnp.asarray(layers), num_steps=4,
                       return_layers=True)
    assert out["x"].shape == (2, 1, 45, 16, 9)
    np.testing.assert_allclose(np.asarray(out["layers"]), layers, rtol=1e-6)
    assert np.all(np.isfinite(out["x"]))


def test_int8_without_exclude_warns(layer_model, capsys, monkeypatch):
    """QUANT_INT8 on the cascade without QUANT_INT8_EXCLUDE prints the
    measured-fence warning (docs/INT8_CASCADE.md: down-path activation
    quantization moves the fidelity AUC 0.70 -> 0.86); with the exclusion
    set it stays quiet and the excluded paths leave the scales table."""
    monkeypatch.setenv("CALODIFF_INT8", "force")
    cfg, model, params = layer_model
    model.config["QUANT_INT8"] = True
    try:
        full = model.prepare_int8(params, n_sigmas=1, batch=1)
        out = capsys.readouterr().out
        assert "QUANT_INT8_EXCLUDE" in out and "INT8_CASCADE" in out

        model.config["QUANT_INT8_EXCLUDE"] = ["ResnetBlock_0/"]
        filt = model.prepare_int8(params, n_sigmas=1, batch=1)
        out = capsys.readouterr().out
        assert "WARNING" not in out
        assert set(full) - set(filt)
        assert not any("ResnetBlock_0/" in p for p in filt)
    finally:
        model.config["QUANT_INT8"] = False
        model.config.pop("QUANT_INT8_EXCLUDE", None)
        model._int8_scales = None
