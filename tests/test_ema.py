"""EMA coverage (VERDICT r2 Weak #4: EMA_DECAY had zero tests).

Covers: the update math against the closed form, checkpoint round-trip of
ema_params, load_for_inference preferring EMA weights, and resuming a
pre-EMA checkpoint through the mixed-key fallback (which must warn loudly
about the non-restored optimizer state, not drop it silently).  The shipped
config derivative configs/config_dataset2_ema.json gives the path a
production user.
"""

import json
import os

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.utils_test import tiny_ds2_config


def _tiny_cfg(**over):
    base = dict(
        BATCH=8, MAXEPOCH=1, NSTEPS=4,
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        CHECKPOINT_NAME="ema_test",
    )
    base.update(over)
    return tiny_ds2_config(**base)


def _make_data(folder, n=16):
    rng = np.random.default_rng(0)
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        showers = rng.exponential(1.0, (n, 6480)).astype(np.float32)
        showers[rng.uniform(size=showers.shape) < 0.8] = 0
        with h5py.File(os.path.join(folder, fname), "w") as f:
            f.create_dataset("showers", data=showers)
            f.create_dataset(
                "incident_energies",
                data=rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32),
            )


def _trainer(tmp_path, **cfg_over):
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import default_flags

    flags = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt")
    )
    return TrainDiffusion(flags, _tiny_cfg(**cfg_over), load_data=False)


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def test_ema_update_matches_closed_form(tmp_path):
    """After N steps, trainer EMA == decay^N * p0 + (1-decay) *
    sum decay^(N-i) p_i (trainer.py train_step EMA update)."""
    decay = 0.9
    t = _trainer(tmp_path, EMA_DECAY=decay)
    t.init_model()
    import optax

    t.opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    t.opt_state = t.opt.init(t.params)
    train_step, _ = t._make_train_step()

    rng = np.random.default_rng(1)
    expected_ema = jax.tree_util.tree_map(jnp.copy, t.params)
    key = jax.random.PRNGKey(0)
    for i in range(4):
        data = jnp.asarray(
            rng.standard_normal((8, 1, 45, 16, 9)).astype(np.float32)
        )
        E = jnp.asarray(rng.uniform(0.1, 1, (8, 1)).astype(np.float32))
        lay = jnp.asarray(rng.standard_normal((8, 46)).astype(np.float32))
        key, k = jax.random.split(key)
        t.params, t.opt_state, t.ema_params, _ = train_step(
            t.params, t.opt_state, t.ema_params, k, data, E, lay
        )
        expected_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p, expected_ema, t.params
        )

    for got, want in zip(_leaves(t.ema_params), _leaves(expected_ema)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    # EMA lags the raw params (they differ after a step)
    diffs = [
        float(jnp.abs(g - p).max())
        for g, p in zip(_leaves(t.ema_params), _leaves(t.params))
    ]
    assert max(diffs) > 0


def test_ema_checkpoint_roundtrip(tmp_path):
    from calodiffusion_tpu.train import checkpoint as ckpt_io
    from calodiffusion_tpu.train.schedulers import (
        EarlyStopper,
        ReduceLROnPlateau,
    )

    t = _trainer(tmp_path, EMA_DECAY=0.99)
    t.init_model()
    import optax

    t.opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    t.opt_state = t.opt.init(t.params)
    # make EMA distinguishable from params
    t.ema_params = jax.tree_util.tree_map(lambda p: p + 1.0, t.params)

    sched = ReduceLROnPlateau(1e-3)
    stop = EarlyStopper(patience=3, mode="val_loss")
    t._save("checkpoint", 0, {0: 1.0}, {0: 2.0}, sched, stop)

    arrays, _ = ckpt_io.load_checkpoint(t.checkpoint_folder, "checkpoint")
    assert "ema_params" in arrays
    for got, want in zip(_leaves(arrays["ema_params"]),
                         _leaves(t.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_load_for_inference_prefers_ema(tmp_path):
    from calodiffusion_tpu.train.schedulers import (
        EarlyStopper,
        ReduceLROnPlateau,
    )

    t = _trainer(tmp_path, EMA_DECAY=0.99)
    t.init_model()
    import optax

    t.opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    t.opt_state = t.opt.init(t.params)
    t.ema_params = jax.tree_util.tree_map(lambda p: p * 0.0 + 7.0, t.params)
    t._save("final", 0, {}, {}, ReduceLROnPlateau(1e-3),
            EarlyStopper(patience=3, mode="val_loss"))

    t2 = _trainer(tmp_path, EMA_DECAY=0.99)
    t2.flags.model_loc = os.path.join(t.checkpoint_folder, "final.ckpt")
    _, params = t2.load_for_inference()
    for leaf in _leaves(params):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.full_like(np.asarray(leaf), 7.0)
        )


@pytest.mark.slow  # two full CLI-level training runs (~2 min)
def test_resume_pre_ema_checkpoint_warns_and_trains(tmp_path, capsys):
    """A checkpoint saved WITHOUT EMA must still resume when EMA_DECAY is
    later enabled: the mixed-key fallback warns about the non-restored
    optimizer state and training continues (trainer.py pickup_checkpoint)."""
    _make_data(tmp_path)
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import default_flags

    flags = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt")
    )
    # stage 1: train one epoch without EMA
    t1 = TrainDiffusion(flags, _tiny_cfg())
    t1.train()
    assert os.path.exists(
        os.path.join(t1.checkpoint_folder, "checkpoint.ckpt")
    )

    # stage 2: resume the same folder with EMA enabled
    flags2 = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt"),
        load=True,
    )
    t2 = TrainDiffusion(flags2, _tiny_cfg(EMA_DECAY=0.99, MAXEPOCH=2))
    t2.train()
    out = capsys.readouterr().out
    assert "optimizer state NOT restored" in out
    assert t2.ema_params is not None
    # training actually continued past the restored epoch
    losses = open(os.path.join(
        t2.checkpoint_folder, "final_training_losses.txt")).read().split()
    assert len(losses) == 2
    assert all(np.isfinite(float(l)) for l in losses)


def test_shipped_ema_config():
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "config_dataset2_ema.json",
    )
    with open(cfg_path) as f:
        cfg = json.load(f)
    assert cfg["EMA_DECAY"] == 0.999
    assert cfg["CHECKPOINT_NAME"].endswith("_ema")
