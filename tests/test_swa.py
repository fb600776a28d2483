"""SWA (stochastic weight averaging) coverage.

``SWA_START_EPOCH`` folds an equal-weight average of the per-epoch
inference-preferred weights (EMA when on, else raw params) into
``swa_params`` (trainer.py ``_swa_update``; arXiv:1803.05407) — the
variance-reduction lever for the measured run-to-run training noise on
the fidelity gates (docs/ROUND3.md).  Covers: the update math against
the closed-form mean, SWA-of-EMA source selection, checkpoint
round-trip incl. ``swa_n``, ``load_for_inference`` preferring SWA over
EMA, exact resume of a mid-SWA run, and an e2e CLI-level training run.
"""

import os

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.utils_test import tiny_ds2_config


def _tiny_cfg(**over):
    base = dict(
        BATCH=8, MAXEPOCH=3, NSTEPS=4,
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        CHECKPOINT_NAME="swa_test",
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


def test_swa_update_matches_closed_form_mean(tmp_path):
    """After folding N weight snapshots, swa_params == their plain mean."""
    t = _trainer(tmp_path, SWA_START_EPOCH=0)
    t.init_model()
    assert t.swa_params is not None and t.swa_n == 0

    snapshots = []
    rng = np.random.default_rng(7)
    for _ in range(4):
        t.params = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32)
            ),
            t.params,
        )
        snapshots.append(t.params)
        t._swa_update()

    assert t.swa_n == 4
    want = jax.tree_util.tree_map(
        lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *snapshots
    )
    for got, exp in zip(_leaves(t.swa_params), _leaves(want)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-5, atol=1e-6)


def test_swa_averages_the_ema_trajectory_when_ema_on(tmp_path):
    """With EMA enabled, SWA folds the EMA weights (the weights inference
    would otherwise use), not the raw params."""
    t = _trainer(tmp_path, SWA_START_EPOCH=0, EMA_DECAY=0.9)
    t.init_model()
    t.ema_params = jax.tree_util.tree_map(lambda p: p * 0 + 3.0, t.params)
    t.params = jax.tree_util.tree_map(lambda p: p * 0 + 100.0, t.params)
    t._swa_update()
    for leaf in _leaves(t.swa_params):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.full_like(np.asarray(leaf), 3.0)
        )


def test_swa_checkpoint_roundtrip_and_inference_preference(tmp_path):
    from calodiffusion_tpu.train import checkpoint as ckpt_io
    from calodiffusion_tpu.train.schedulers import (
        EarlyStopper,
        ReduceLROnPlateau,
    )

    t = _trainer(tmp_path, SWA_START_EPOCH=0, EMA_DECAY=0.99)
    t.init_model()
    import optax

    t.opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    t.opt_state = t.opt.init(t.params)
    t.ema_params = jax.tree_util.tree_map(lambda p: p * 0 + 7.0, t.params)
    t.swa_params = jax.tree_util.tree_map(lambda p: p * 0 + 5.0, t.params)
    t.swa_n = 2
    t._save("final", 0, {}, {}, ReduceLROnPlateau(1e-3),
            EarlyStopper(patience=3, mode="val_loss"))

    arrays, host = ckpt_io.load_checkpoint(t.checkpoint_folder, "final")
    assert host["swa_n"] == 2
    for got, exp in zip(_leaves(arrays["swa_params"]),
                        _leaves(t.swa_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    # SWA (5.0) beats EMA (7.0) in the inference preference order
    t2 = _trainer(tmp_path, SWA_START_EPOCH=0, EMA_DECAY=0.99)
    t2.flags.model_loc = os.path.join(t.checkpoint_folder, "final.ckpt")
    _, params = t2.load_for_inference()
    for leaf in _leaves(params):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.full_like(np.asarray(leaf), 5.0)
        )


def test_inference_params_skips_unaccumulated_swa(tmp_path):
    """swa_params saved before the first fold (swa_n == 0) must NOT be
    preferred — it is just a copy of the init weights."""
    from calodiffusion_tpu.train import checkpoint as ckpt_io

    arrays = {"params": {"w": np.ones(3)},
              "swa_params": {"w": np.zeros(3)},
              "ema_params": {"w": np.full(3, 7.0)}}
    got = ckpt_io.inference_params(arrays, {"swa_n": 0})
    np.testing.assert_array_equal(got["w"], np.full(3, 7.0))
    got = ckpt_io.inference_params(arrays, {"swa_n": 3})
    np.testing.assert_array_equal(got["w"], np.zeros(3))
    got = ckpt_io.inference_params({"params": {"w": np.ones(3)}}, {})
    np.testing.assert_array_equal(got["w"], np.ones(3))


def test_swa_arms_on_plateau(tmp_path):
    """With SWA_ARM_ON_PLATEAU, the start epoch arms when the early
    stopper is half way to firing, even with no scheduled start."""
    from calodiffusion_tpu.train.schedulers import EarlyStopper

    t = _trainer(tmp_path, SWA_ARM_ON_PLATEAU=True)
    t.init_model()
    assert t.swa_params is not None and t.swa_start < 0

    es = EarlyStopper(patience=4, mode="val_loss")
    es.counter = 1
    assert not t._swa_due(7, es)          # not yet on plateau
    es.counter = 2                        # half way to firing
    assert t._swa_due(7, es)
    assert t.swa_start == 7
    t._swa_update()
    es.counter = 0                        # val improved again later...
    assert t._swa_due(8, es)              # ...but SWA stays armed


def test_swa_plateau_does_not_preempt_scheduled_start(tmp_path):
    """A scheduled start that has already engaged wins over re-arming."""
    from calodiffusion_tpu.train.schedulers import EarlyStopper

    t = _trainer(tmp_path, SWA_START_EPOCH=3, SWA_ARM_ON_PLATEAU=True)
    t.init_model()
    es = EarlyStopper(patience=4, mode="val_loss")
    es.counter = 4
    assert not t._swa_due(1, es) or t.swa_start <= 1  # may arm early
    # past the scheduled start: due regardless of the counter
    t2 = _trainer(tmp_path, SWA_START_EPOCH=3, SWA_ARM_ON_PLATEAU=True)
    t2.init_model()
    es.counter = 0
    assert t2._swa_due(3, es) and t2.swa_start == 3


def test_swa_never_engaged_warns(tmp_path, capsys):
    """SWA configured but start never reached: training ends with a loud
    warning instead of silently falling back to EMA (ADVICE r3 medium)."""
    _make_data(tmp_path)
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import default_flags

    flags = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt")
    )
    t = TrainDiffusion(flags, _tiny_cfg(SWA_START_EPOCH=50, MAXEPOCH=1))
    t.train()
    assert t.swa_n == 0
    out = capsys.readouterr().out
    assert "WARNING: SWA was enabled but no epochs were averaged" in out


def test_best_val_carries_inference_weights(tmp_path):
    """best_val.ckpt carries EMA/SWA arrays + swa_n sidecar so loading it
    honors the SWA > EMA > raw preference (ADVICE r3 low)."""
    _make_data(tmp_path)
    from calodiffusion_tpu.train import checkpoint as ckpt_io
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import default_flags

    flags = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt")
    )
    t = TrainDiffusion(
        flags, _tiny_cfg(SWA_START_EPOCH=0, EMA_DECAY=0.99, MAXEPOCH=1)
    )
    t.train()
    assert t.swa_n == 1
    arrays, host = ckpt_io.load_checkpoint(t.checkpoint_folder, "best_val")
    assert host["swa_n"] == 1
    assert "ema_params" in arrays and "swa_params" in arrays
    picked = ckpt_io.inference_params(arrays, host)
    for got, exp in zip(_leaves(picked), _leaves(t.swa_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_shipped_swa_config():
    import json

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "config_dataset2_swa.json",
    )
    with open(cfg_path) as f:
        cfg = json.load(f)
    assert cfg["SWA_START_FRAC"] == 0.75
    assert cfg["EMA_DECAY"] == 0.999  # SWA averages the EMA trajectory
    assert cfg["CHECKPOINT_NAME"].endswith("_swa")
    # EARLYSTOP=20 commonly ends the run long before 0.75*MAXEPOCH; the
    # plateau arming is what guarantees the config's headline feature
    # actually engages (ADVICE r3 medium)
    assert cfg["SWA_ARM_ON_PLATEAU"] is True


@pytest.mark.slow  # two CLI-level training runs (~2 min)
def test_swa_e2e_train_and_resume(tmp_path):
    """3-epoch run with SWA_START_EPOCH=1 accumulates swa_n == 2; resuming
    for 2 more epochs continues the average (swa_n == 4) through the typed
    (opt_state-preserving) restore path."""
    _make_data(tmp_path)
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import default_flags

    flags = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt")
    )
    t1 = TrainDiffusion(flags, _tiny_cfg(SWA_START_EPOCH=1, MAXEPOCH=3))
    t1.train()
    assert t1.swa_n == 2  # epochs 1 and 2 folded
    # the tail average differs from the final raw weights
    diffs = [float(jnp.abs(s - p).max())
             for s, p in zip(_leaves(t1.swa_params), _leaves(t1.params))]
    assert max(diffs) > 0

    flags2 = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt"),
        load=True,
    )
    t2 = TrainDiffusion(flags2, _tiny_cfg(SWA_START_EPOCH=1, MAXEPOCH=5))
    t2.train()
    assert t2.swa_n == 4  # epochs 3 and 4 continued the same average
