"""End-to-end slice: synthetic dataset-2 HDF5 -> preprocess/cache ->
2-epoch training -> checkpoint -> resume -> sample -> ReverseNorm.

Mirrors the reference's CLI-level smoke strategy (reference
tests/test_execution.py) but exercises the library API directly.
"""

import os

import h5py
import numpy as np
import pytest

import jax

from calodiffusion_tpu.data.loader import load_data
from calodiffusion_tpu.train.trainer import TrainDiffusion
from calodiffusion_tpu.utils.config import default_flags
from tests.utils_test import tiny_ds2_config


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    folder = tmp_path_factory.mktemp("ds2data")
    rng = np.random.default_rng(0)
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        n = 48
        showers = rng.exponential(1.0, (n, 6480)).astype(np.float32)
        showers[rng.uniform(size=showers.shape) < 0.8] = 0
        energies = rng.uniform(1000.0, 1000000.0, (n, 1)).astype(np.float32)
        with h5py.File(folder / fname, "w") as f:
            f.create_dataset("showers", data=showers)
            f.create_dataset("incident_energies", data=energies)
    return str(folder)


@pytest.fixture(scope="module")
def cfg(synth_data):
    return tiny_ds2_config(
        VAL_FILES=["dataset_2_2.hdf5"],
        EVAL=["dataset_2_2.hdf5"],
        BATCH=16,
        MAXEPOCH=2,
        NSTEPS=8,
        LAYER_SIZE_UNET=[8, 8, 8, 8],
        COND_SIZE_UNET=16,
    )


def test_load_data_cache(cfg, synth_data):
    flags = default_flags(data_folder=synth_data)
    train_loader, val_loader = load_data(flags, cfg)
    assert os.path.exists(os.path.join(synth_data, "dataset_2_1.hdf5.npz"))
    E, layers, showers = next(iter(train_loader))
    assert showers.shape == (16, 1, 45, 16, 9)
    assert E.shape == (16, 1)
    assert layers.shape == (16, 46)  # totalE + 45 layer fractions
    assert np.all(np.isfinite(showers))
    assert len(train_loader) == 3  # 48 events / batch 16


@pytest.mark.slow  # ~5 min
def test_train_checkpoint_resume_sample(cfg, synth_data, tmp_path):
    flags = default_flags(
        data_folder=synth_data, checkpoint_folder=str(tmp_path / "ckpt")
    )
    trainer = TrainDiffusion(flags, cfg)
    model, params = trainer.train()

    folder = trainer.checkpoint_folder
    assert os.path.exists(os.path.join(folder, "checkpoint.ckpt"))
    assert os.path.exists(os.path.join(folder, "final.ckpt"))
    assert os.path.exists(os.path.join(folder, "best_val.ckpt"))
    assert os.path.exists(os.path.join(folder, "config.json"))
    assert os.path.exists(os.path.join(folder, "final_training_losses.txt"))

    # losses should be finite and improving-ish
    with open(os.path.join(folder, "final_training_losses.txt")) as f:
        losses = [float(x) for x in f.read().split()]
    assert len(losses) == 2 and all(np.isfinite(losses))

    # resume: one more epoch from the checkpoint
    flags2 = default_flags(
        data_folder=synth_data, checkpoint_folder=str(tmp_path / "ckpt"),
        load=True,
    )
    cfg2 = dict(cfg, MAXEPOCH=3)
    trainer2 = TrainDiffusion(flags2, cfg2)
    trainer2.train()
    with open(os.path.join(folder, "final_training_losses.txt")) as f:
        losses2 = [float(x) for x in f.read().split()]
    assert len(losses2) == 3  # epochs 0,1 restored + epoch 2
    # the restored history must be the FIRST run's values (true resume, not a
    # silent fresh restart)
    np.testing.assert_allclose(losses2[:2], losses, rtol=1e-6)

    # generation end-to-end: sample EVAL loader and reverse-normalize
    eval_flags = default_flags(data_folder=synth_data)
    eval_loader, _ = load_data(eval_flags, cfg, eval=True)
    generated, energies = model.generate(
        params, jax.random.PRNGKey(0), eval_loader, sample_steps=4
    )
    assert generated.shape == (48, 6480)
    assert energies.shape == (48, 1)
    assert np.all(np.isfinite(generated))
    assert np.all(generated >= 0)  # post-ReverseNorm physical energies


@pytest.mark.slow  # ~2.5 min
def test_train_ragged_val_with_batch_override(cfg, synth_data, tmp_path):
    """CLI --batch-size overrides config BATCH; val set (48 events) is
    ragged at batch 20 (20+20+8).  Regression for round-1: val_rnd was
    sized from config BATCH and padded rows biased the val mean."""
    flags = default_flags(
        data_folder=synth_data, checkpoint_folder=str(tmp_path / "ckpt_rg"),
        batch_size=20,
    )
    cfg_rg = dict(cfg, MAXEPOCH=1)
    trainer = TrainDiffusion(flags, cfg_rg)
    trainer.train()
    assert trainer.loader_val.batch_size == 20
    folder = trainer.checkpoint_folder
    with open(os.path.join(folder, "final_validation_losses.txt")) as f:
        vlosses = [float(x) for x in f.read().split()]
    assert len(vlosses) == 1 and np.isfinite(vlosses[0])


def test_norm_cache_cfg_string_forms():
    """Yaml-lax configs may carry CACHE_DATA_ON_DEVICE as a string; the
    opt-out must not require a literal JSON false (ADVICE r4)."""
    from calodiffusion_tpu.train.trainer import _norm_cache_cfg

    assert _norm_cache_cfg(False) is False
    assert _norm_cache_cfg("false") is False
    assert _norm_cache_cfg("0") is False
    assert _norm_cache_cfg("off") is False
    assert _norm_cache_cfg(True) is True
    assert _norm_cache_cfg("true") is True
    assert _norm_cache_cfg("auto") == "auto"
    assert _norm_cache_cfg(None) == "auto"


@pytest.mark.slow
def test_train_cache_opt_out_matches_cached(cfg, synth_data, tmp_path):
    """CACHE_DATA_ON_DEVICE='false' (string form) must stream the val
    working set host-side with IDENTICAL semantics to the device-cached
    default: same seed + same data -> same recorded val losses."""
    losses = {}
    for tag, cache_val in (("on", "auto"), ("off", "false")):
        flags = default_flags(
            data_folder=synth_data,
            checkpoint_folder=str(tmp_path / f"ckpt_{tag}"),
        )
        c = dict(cfg, MAXEPOCH=2, CACHE_DATA_ON_DEVICE=cache_val)
        trainer = TrainDiffusion(flags, c)
        trainer.train()
        with open(os.path.join(trainer.checkpoint_folder,
                               "final_validation_losses.txt")) as f:
            losses[tag] = [float(x) for x in f.read().split()]
        assert len(losses[tag]) == 2
        assert all(np.isfinite(v) for v in losses[tag])
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=1e-5)
