"""Tests for the auxiliary tools: h5 merge, average showers, mask files."""

import h5py
import numpy as np

from calodiffusion_tpu.tools.create_average_showers import build_average_showers
from calodiffusion_tpu.tools.h5_merge import merge_multiple
from calodiffusion_tpu.utils.misc import (
    apply_in_batches,
    conversion_preprocess,
    split_data_np,
)
from tests.utils_test import tiny_ds2_config


def test_h5_merge(tmp_path):
    files = []
    for i in range(3):
        p = tmp_path / f"in{i}.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("showers", data=np.full((5, 4), i, np.float32))
            f.create_dataset("incident_energies",
                             data=np.full((5, 1), i, np.float32))
        files.append(str(p))
    out = str(tmp_path / "merged.h5")
    merge_multiple(out, files)
    with h5py.File(out, "r") as f:
        assert f["showers"].shape == (15, 4)
        np.testing.assert_allclose(f["incident_energies"][:, 0],
                                   np.repeat([0, 1, 2], 5))


def test_average_showers(tmp_path):
    rng = np.random.default_rng(0)
    n = 256
    showers = rng.exponential(1.0, (n, 6480)).astype(np.float32)
    energies = rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32)
    with h5py.File(tmp_path / "dataset_2_1.hdf5", "w") as f:
        f.create_dataset("showers", data=showers)
        f.create_dataset("incident_energies", data=energies)

    cfg = tiny_ds2_config()
    avg, std, E_bins = build_average_showers(cfg, str(tmp_path))
    assert avg.shape[0] == 100 and E_bins.shape == (100,)
    assert np.all(np.isfinite(avg)) and np.all(std >= 0)


def test_conversion_preprocess(tmp_path):
    p = str(tmp_path / "evts.hdf5")
    data = np.ones((10, 8), np.float32)
    data[:, 3] = 0  # voxel 3 always empty
    with h5py.File(p, "w") as f:
        f.create_dataset("showers", data=data)
    mask_file = conversion_preprocess(p)
    with h5py.File(mask_file, "r") as f:
        mask = f["mask"][:]
    assert mask[3] and mask.sum() == 1


def test_split_and_batched_apply():
    data = np.arange(100, dtype=np.float32).reshape(100, 1)
    a, b = split_data_np(data.copy(), frac=0.8)
    assert a.shape == (80, 1) and b.shape == (20, 1)
    out = apply_in_batches(lambda x: x * 2, data, batch_size=7)
    np.testing.assert_allclose(out, data * 2)


def test_plot_h5_shower_tool(tmp_path):
    """Hex-cell shower drawing CLI (the reference's legacy script calls an
    undefined plot_shower_hex; ours must run)."""
    import h5py

    from calodiffusion_tpu.tools.plot_h5_shower import main
    from calodiffusion_tpu.utils import hgcal_utils

    geom = hgcal_utils.make_synthetic_geom(nlayers=3, cells_per_ring=6,
                                           nrings=4)
    geom_path = str(tmp_path / "geom.pkl")
    hgcal_utils.save_geom(geom, geom_path)
    C = geom.max_ncell
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "showers.h5", "w") as f:
        f.create_dataset(
            "showers", data=rng.exponential(0.01, (4, 3, C)).astype(np.float32)
        )
    out = tmp_path / "plots"
    main(["-g", geom_path, "-i", str(tmp_path / "showers.h5"),
          "-n", "1", "-o", str(out)])
    assert (out / "shower0_lay0.png").exists()
    assert (out / "avg_shower_lay2.png").exists()


def test_plot_avg_shower_tool(tmp_path):
    import json

    import h5py

    from calodiffusion_tpu.tools.plot_avg_shower import main
    from tests.utils_test import tiny_ds2_config

    cfg = tiny_ds2_config()
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(1)
    with h5py.File(tmp_path / "showers.h5", "w") as f:
        f.create_dataset(
            "showers",
            data=rng.exponential(1.0, (8, 6480)).astype(np.float32),
        )
    out = tmp_path / "plots"
    main(["-c", str(tmp_path / "config.json"),
          "-i", str(tmp_path / "showers.h5"), "-o", str(out)])
    assert (out / "avg_shower_lay0.png").exists()
    assert (out / "avg_shower_lay44.png").exists()
