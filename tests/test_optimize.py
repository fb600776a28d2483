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
