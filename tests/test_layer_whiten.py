"""Per-dim whitened diffusion space for the layer-energy cascade model.

The consts standardization of the layer vector uses one global (mean, std),
leaving per-dim scales from ~0.05 to ~1.0 in the diffusion space; the stage-1
ResNet diffuses a per-dim whitened vector instead (LayerDiffusion.whiten_layers
/ unwhiten_layers), with stats computed from the training data by
TrainLayerModel and stored in params["layer_model"]["whiten"].  Absent stats
mean identity — reference-imported checkpoints keep exact parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calodiffusion_tpu.models.layerdiffusion import LayerDiffusion
from tests.utils_test import fake_batch, tiny_ds2_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_ds2_config(
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        LAYER_STEPS=4, NSTEPS=4,
    )
    model = LayerDiffusion(cfg, n_steps=4, loss_type="l2")
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def with_whiten(params, mean, std):
    params = dict(params)
    params["layer_model"] = dict(params["layer_model"])
    params["layer_model"]["whiten"] = {
        "mean": jnp.asarray(mean, jnp.float32),
        "std": jnp.asarray(std, jnp.float32),
    }
    return params


def test_identity_without_stats(model_and_params):
    cfg, model, params = model_and_params
    u = jnp.linspace(-2, 2, 46)[None, :]
    assert np.allclose(model.whiten_layers(params, u), u)
    assert np.allclose(model.unwhiten_layers(params, u), u)


def test_whiten_roundtrip(model_and_params):
    cfg, model, params = model_and_params
    mean = np.linspace(-1.8, 0.9, 46)
    std = np.geomspace(0.05, 1.0, 46)
    p = with_whiten(params, mean, std)
    u = jnp.asarray(np.random.default_rng(0).normal(size=(3, 46)),
                    jnp.float32)
    w = model.whiten_layers(p, u)
    assert np.allclose(model.unwhiten_layers(p, w), u, atol=1e-5)
    # whitening really rescales per dim
    assert np.allclose(np.asarray(w), (np.asarray(u) - mean) / std, atol=1e-5)


def test_sample_layers_unwhitens(model_and_params):
    """sample_layers output reflects the stored stats: a shifted-mean
    whitening shifts the sampled standardized vector by the same amount."""
    cfg, model, params = model_and_params
    _, E, _ = fake_batch(cfg, batch=4)
    E = jnp.asarray(E)
    base = model.sample_layers(params, jax.random.PRNGKey(3), E)
    shifted = model.sample_layers(
        with_whiten(params, np.full(46, 5.0), np.ones(46)),
        jax.random.PRNGKey(3), E,
    )
    assert np.allclose(np.asarray(shifted) - np.asarray(base), 5.0, atol=1e-4)


def test_whiten_stats_get_zero_grads(model_and_params):
    """stop_gradient: training must not drift the frozen stats."""
    cfg, model, params = model_and_params
    data, E, layers = fake_batch(cfg)
    p = with_whiten(params, np.zeros(46), np.full(46, 0.5))
    model.set_layer_state(True)
    try:
        grads = jax.grad(lambda q: model.compute_loss(
            q, jax.random.PRNGKey(1), jnp.asarray(data), jnp.asarray(E),
            layers=jnp.asarray(layers)))(p)
    finally:
        model.set_layer_state(False)
    g_w = grads["layer_model"]["whiten"]
    assert float(jnp.abs(g_w["mean"]).sum()) == 0.0
    assert float(jnp.abs(g_w["std"]).sum()) == 0.0
    g_net = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(
        grads["layer_model"]["params"]))
    assert g_net > 0


def test_trainer_computes_stats_and_checkpoints(tmp_path):
    """TrainLayerModel computes per-dim stats from its loader, the loss is
    finite through the whitened path, and the composite inference load
    round-trips the stats."""
    import h5py

    from calodiffusion_tpu.train.train_layer_model import TrainLayerModel
    from calodiffusion_tpu.utils.config import default_flags

    rng = np.random.default_rng(0)
    for fname, n in (("dataset_2_1.hdf5", 48), ("dataset_2_2.hdf5", 16)):
        with h5py.File(tmp_path / fname, "w") as f:
            f.create_dataset(
                "showers", data=rng.gamma(2.0, 1.0, (n, 6480)).astype("f4"))
            f.create_dataset(
                "incident_energies",
                data=rng.uniform(1e3, 1e6, (n, 1)).astype("f4"))
    cfg = tiny_ds2_config(
        VAL_FILES=["dataset_2_2.hdf5"], EVAL=["dataset_2_2.hdf5"],
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        BATCH=16, MAXEPOCH=1, NSTEPS=4, LAYER_STEPS=4,
        CHECKPOINT_NAME="whiten_test",
    )
    flags = default_flags(data_folder=str(tmp_path),
                          checkpoint_folder=str(tmp_path / "ckpt"))
    trainer = TrainLayerModel(flags, cfg)
    trainer.train()
    w = trainer.params["layer_model"]["whiten"]
    assert w["mean"].shape == (46,) and w["std"].shape == (46,)
    assert np.all(np.isfinite(w["mean"])) and np.all(w["std"] >= 1e-3)

    import os

    inf = TrainLayerModel(
        default_flags(
            data_folder=str(tmp_path),
            model_loc=os.path.join(trainer.checkpoint_folder, "final.ckpt"),
        ),
        dict(cfg, layer_model=os.path.join(
            trainer.checkpoint_folder, "final.ckpt")),
        load_data=False, save_model=False, inference=True,
    )
    model, params = inf.load_for_inference()
    w2 = params["layer_model"]["whiten"]
    assert np.allclose(np.asarray(w2["mean"]), np.asarray(w["mean"]))
    assert np.allclose(np.asarray(w2["std"]), np.asarray(w["std"]))
