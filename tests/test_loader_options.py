"""Loader option paths: partial-event caches (.n<N>.npz) and batch-size
override (reference utils.py:877-878, :909-918)."""

import os

import h5py
import numpy as np

from calodiffusion_tpu.data.loader import load_data
from calodiffusion_tpu.utils.config import default_flags
from tests.utils_test import tiny_ds2_config


def _make_file(path, n):
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "showers", data=rng.exponential(1.0, (n, 6480)).astype(np.float32)
        )
        f.create_dataset(
            "incident_energies",
            data=rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32),
        )


def test_partial_load_tag(tmp_path):
    _make_file(tmp_path / "dataset_2_1.hdf5", 64)
    cfg = tiny_ds2_config(BATCH=8)
    flags = default_flags(data_folder=str(tmp_path), nevts=20)
    loader, _ = load_data(flags, cfg)
    # partial caches carry the .n<N>.npz tag (drop-in reference naming)
    assert os.path.exists(tmp_path / "dataset_2_1.hdf5.n20.npz")
    total = sum(E.shape[0] for E, _, _ in loader)
    assert total == 20


def test_batch_size_override(tmp_path):
    _make_file(tmp_path / "dataset_2_1.hdf5", 64)
    cfg = tiny_ds2_config(BATCH=8)
    flags = default_flags(data_folder=str(tmp_path), batch_size=32)
    loader, _ = load_data(flags, cfg)
    E, _, _ = next(iter(loader))
    assert E.shape[0] == 32


def test_holdout(tmp_path):
    _make_file(tmp_path / "dataset_2_1.hdf5", 64)
    cfg = tiny_ds2_config(BATCH=8, HOLDOUT=16)
    flags = default_flags(data_folder=str(tmp_path))
    loader, _ = load_data(flags, cfg)
    total = sum(E.shape[0] for E, _, _ in loader)
    assert total == 48  # 64 - 16 held out
