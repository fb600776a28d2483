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


def _collect_E(loader):
    return np.concatenate([E for E, _, _ in loader], axis=0)


def test_job_idx_disjoint_slices(tmp_path):
    """--job-idx i with -n N reads events [i*N, (i+1)*N) - the intended
    reference semantics (inference.py:138, tests/plot_evolution.py:69-102)."""
    _make_file(tmp_path / "dataset_2_1.hdf5", 64)
    cfg = tiny_ds2_config(BATCH=8)

    all_flags = default_flags(data_folder=str(tmp_path))
    E_all = _collect_E(load_data(all_flags, cfg)[0])

    E_jobs = []
    for j in range(2):
        flags = default_flags(data_folder=str(tmp_path), nevts=16, job_idx=j)
        E_jobs.append(_collect_E(load_data(flags, cfg)[0]))

    assert E_jobs[0].shape[0] == E_jobs[1].shape[0] == 16
    np.testing.assert_allclose(E_jobs[0], E_all[:16], rtol=1e-6)
    np.testing.assert_allclose(E_jobs[1], E_all[16:32], rtol=1e-6)
    # job caches must not alias each other or the .n16 cache
    assert os.path.exists(tmp_path / "dataset_2_1.hdf5.n16.npz")
    assert os.path.exists(tmp_path / "dataset_2_1.hdf5.s16.n16.npz")


def test_job_idx_spillover_across_files(tmp_path):
    """A job offset past the first file starts inside the next one."""
    _make_file(tmp_path / "dataset_2_1.hdf5", 16)
    _make_file(tmp_path / "dataset_2_2.hdf5", 16)
    cfg = tiny_ds2_config(
        FILES=["dataset_2_1.hdf5", "dataset_2_2.hdf5"], BATCH=8
    )
    E_file2 = _collect_E(load_data(
        default_flags(data_folder=str(tmp_path),
                      config={"FILES": ["dataset_2_2.hdf5"]}),
        tiny_ds2_config(FILES=["dataset_2_2.hdf5"], BATCH=8),
    )[0])

    flags = default_flags(data_folder=str(tmp_path), nevts=16, job_idx=1)
    E_job = _collect_E(load_data(flags, cfg)[0])
    assert E_job.shape[0] == 16
    np.testing.assert_allclose(E_job, E_file2, rtol=1e-6)


def test_job_idx_never_spills_into_val_files(tmp_path):
    """The --job-idx slice is a slice of the TRAIN events only; a slice that
    exhausts the train files must raise, not silently consume VAL_FILES as
    per-job training data (ADVICE r2)."""
    import pytest

    _make_file(tmp_path / "dataset_2_1.hdf5", 16)
    _make_file(tmp_path / "dataset_2_val.hdf5", 16)
    cfg = tiny_ds2_config(
        FILES=["dataset_2_1.hdf5"], VAL_FILES=["dataset_2_val.hdf5"], BATCH=8
    )
    flags = default_flags(data_folder=str(tmp_path), nevts=16, job_idx=1)
    with pytest.raises(ValueError, match="training files"):
        load_data(flags, cfg)

    # a slice that stays within the train file still works (val loader is
    # None because the nevts budget breaks before VAL_FILES — reference
    # parity: utils.py:973-976 decrements the same budget across both lists)
    flags0 = default_flags(data_folder=str(tmp_path), nevts=8, job_idx=1)
    train, val = load_data(flags0, cfg)
    E = _collect_E(train)
    assert E.shape[0] == 8
    assert val is None


def test_showerscale_default_matches_reference(tmp_path):
    """A config omitting SHOWERSCALE must use the reference loader default
    of 200.0 (utils.py:871) - NOT 0.001.  The reference's shipped
    CaloChallenge configs spell the key SHOWER_SCALE, which neither code
    reads, so this default is what those configs actually run with."""
    _make_file(tmp_path / "dataset_2_1.hdf5", 16)
    base = tiny_ds2_config(BATCH=8)

    cfg_default = dict(base)
    del cfg_default["SHOWERSCALE"]
    flags = default_flags(data_folder=str(tmp_path))
    E_default = _collect_E(load_data(flags, cfg_default)[0])

    os.remove(tmp_path / "dataset_2_1.hdf5.npz")
    cfg_200 = dict(base, SHOWERSCALE=200.0)
    E_200 = _collect_E(load_data(flags, cfg_200)[0])

    os.remove(tmp_path / "dataset_2_1.hdf5.npz")
    cfg_milli = dict(base, SHOWERSCALE=0.001)
    E_milli = _collect_E(load_data(flags, cfg_milli)[0])

    np.testing.assert_allclose(E_default, E_200, rtol=0)
    assert not np.allclose(E_default, E_milli)


def test_showerscale_write_out_roundtrip(tmp_path):
    """With SHOWERSCALE omitted, loader (x200) and write_out (/200) use the
    same default, so generated files come back in the raw units of the
    training h5 (round 1 had loader=0.001 vs write_out=200: 5 orders off)."""
    from calodiffusion_tpu.inference import LoadSamples, write_out

    cfg = tiny_ds2_config(BATCH=8)
    del cfg["SHOWERSCALE"]
    rng = np.random.default_rng(1)
    raw = rng.exponential(1.0, (8, 6480)).astype(np.float32)
    raw_E = rng.uniform(1e3, 1e6, (8, 1)).astype(np.float32)

    # generate() returns physical units = raw * loader scale (200.0)
    physical, physical_E = raw * 200.0, raw_E * 200.0
    fout = str(tmp_path / "generated.h5")
    flags = default_flags(data_folder=str(tmp_path), hgcal=False)
    write_out(fout, flags, cfg, physical.copy(), physical_E.copy())

    with h5py.File(fout, "r") as f:
        np.testing.assert_allclose(f["showers"][:], raw, rtol=1e-5)
        np.testing.assert_allclose(f["incident_energies"][:], raw_E, rtol=1e-5)

    # plot path: generated and Geant eval files get the same LoadSamples
    # factor (0.001 by reference parity), so comparisons stay consistent
    flags.plot_reshape = False
    flags.EMin = -1.0
    gen, en = LoadSamples(fout, flags, cfg)
    np.testing.assert_allclose(
        gen, raw.reshape(cfg["SHAPE_FINAL"]) * 0.001, rtol=1e-5
    )
