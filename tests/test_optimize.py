"""End-to-end Optimize harness test: one random-search trial training a tiny
model and scoring the COUNT objective (no optuna needed - exercises the
fallback study)."""

import json
import os

import h5py
import numpy as np
import pytest

from calodiffusion_tpu.train.optimize import Optimize
from calodiffusion_tpu.train.trainer import TrainDiffusion
from calodiffusion_tpu.utils.config import default_flags
from tests.utils_test import tiny_ds2_config

pytestmark = pytest.mark.slow  # optuna harness trains models, ~85s


@pytest.mark.slow
def test_optimize_single_trial(tmp_path):
    rng = np.random.default_rng(0)
    n = 32
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        showers = rng.exponential(1.0, (n, 6480)).astype(np.float32)
        with h5py.File(tmp_path / fname, "w") as f:
            f.create_dataset("showers", data=showers)
            f.create_dataset(
                "incident_energies",
                data=rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32),
            )

    cfg = tiny_ds2_config(
        VAL_FILES=["dataset_2_2.hdf5"],
        BATCH=16, MAXEPOCH=1, NSTEPS=2,
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        CHECKPOINT_NAME="opt_test",
        OPTIMIZE={
            "LR": [1e-4, 1e-3],
            "SAMPLER_SETTINGS": {},
        },
        SAMPLER="DDim",
    )
    flags = default_flags(
        data_folder=str(tmp_path),
        checkpoint_folder=str(tmp_path / "ckpt"),
    )
    flags.study_name = "unit"
    flags.n_trials = 1
    flags.results_folder = str(tmp_path / "results")

    opt = Optimize(flags, TrainDiffusion, ["COUNT"])
    flags.config = cfg
    opt()

    report = tmp_path / "results" / "unit_report.json"
    assert report.exists()
    data = json.loads(report.read_text())
    assert len(data["number"]) == 1
    # the COUNT objective produced a finite value
    assert data["values"][0] is not None


@pytest.mark.slow
def test_optimize_real_optuna_two_trials(tmp_path):
    """The real (non-fallback) optuna branch: 2-trial multi-objective study
    via optuna.create_study, trials-report JSON in the reference's shape
    (reference train/optimize.py:199-225).  Runs where optuna is installed
    (CI installs it; skipped otherwise)."""
    optuna = pytest.importorskip("optuna")

    rng = np.random.default_rng(0)
    n = 32
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        showers = rng.exponential(1.0, (n, 6480)).astype(np.float32)
        with h5py.File(tmp_path / fname, "w") as f:
            f.create_dataset("showers", data=showers)
            f.create_dataset(
                "incident_energies",
                data=rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32),
            )

    cfg = tiny_ds2_config(
        VAL_FILES=["dataset_2_2.hdf5"],
        BATCH=16, MAXEPOCH=1, NSTEPS=2,
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        CHECKPOINT_NAME="opt_optuna",
        OPTIMIZE={"LR": [1e-4, 1e-3], "SAMPLER_SETTINGS": {}},
        SAMPLER="DDim",
    )
    flags = default_flags(
        data_folder=str(tmp_path), checkpoint_folder=str(tmp_path / "ckpt")
    )
    flags.study_name = "unit_optuna"
    flags.n_trials = 2
    flags.results_folder = str(tmp_path / "results")
    flags.config = cfg

    from calodiffusion_tpu.train.optimize import _create_study

    study = _create_study("probe", ["minimize", "maximize"])
    assert isinstance(study, optuna.study.Study), (
        "optuna installed but _create_study fell back to random search"
    )
    assert [d.name.lower() for d in study.directions] == [
        "minimize", "maximize"
    ]

    opt = Optimize(flags, TrainDiffusion, ["COUNT"])
    opt()

    report = tmp_path / "results" / "unit_optuna_report.json"
    assert report.exists()
    data = json.loads(report.read_text())
    # reference report shape: trials_dataframe columns incl. number/state
    assert len(data["number"]) == 2
    assert all(s == "COMPLETE" for s in data["state"])
    value_key = "values" if "values" in data else "values_0"
    assert all(v is not None for v in data[value_key])
