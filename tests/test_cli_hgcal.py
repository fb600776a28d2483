"""HGCal CLI end-to-end on synthetic geometry + mocked data (the reference's
hgcal-marked suite runs the same shape of test with a fabricated HDF5;
reference tests/test_execution.py:173-250)."""

import json
import os

import h5py
import numpy as np
import pytest
from click.testing import CliRunner

from calodiffusion_tpu.inference import inference
from calodiffusion_tpu.training import train
from calodiffusion_tpu.utils import hgcal_utils
from tests.utils_test import tiny_ds2_config

pytestmark = [pytest.mark.hgcal, pytest.mark.slow]


@pytest.fixture(scope="module")
def hgcal_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("hgcal_cli")
    geom_path = root / "geom.pkl"
    geom = hgcal_utils.make_synthetic_geom(nlayers=4, cells_per_ring=6,
                                           nrings=5)
    hgcal_utils.save_geom(geom, str(geom_path))
    C = geom.max_ncell

    data = root / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    n = 32
    with h5py.File(data / "mock_hgcal.h5", "w") as f:
        f.create_dataset("gen_info",
                         data=rng.uniform(0.3, 0.9, (n, 3)).astype("<f4"))
        f.create_dataset("showers",
                         data=rng.random((n, 4, C)).astype("<f4"))

    cfg = tiny_ds2_config(
        FILES=["mock_hgcal.h5"],
        EVAL=["mock_hgcal.h5"],
        VAL_FILES=[],
        HGCAL=True,
        DATASET_NUM=121,
        BIN_FILE=str(geom_path),
        SHOWER_EMBED="NN-pre-embed",
        TRAINABLE_EMBED=False,
        SHAPE_ORIG=[-1, 4, C],
        SHAPE_PAD=[-1, 1, 4, 8, 6],
        SHAPE_FINAL=[-1, 1, 4, 8, 6],
        MAX_CELLS=C,
        LAYER_SIZE_UNET=[8, 8, 8, 8],
        COND_SIZE_UNET=16,
        EMAX=[100, 2.01, 1.572],
        EMIN=[50, 1.99, 1.57],
        logE=False,
        MAXDEP=1.0,
        SHOWERSCALE=1.0,
        BATCH=16,
        MAXEPOCH=1,
        NSTEPS=4,
        CHECKPOINT_NAME="hgcal_cli",
    )
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    return root, str(data), str(cfg_path), C


def test_cli_train_hgcal(hgcal_workspace):
    root, data, cfg, C = hgcal_workspace
    runner = CliRunner()
    result = runner.invoke(
        train,
        ["-c", cfg, "-d", data, "--checkpoint", str(root / "ckpt"),
         "--hgcal", "diffusion"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert os.path.exists(root / "ckpt" / "hgcal_cli_Diffusion" / "final.ckpt")


def test_cli_inference_hgcal(hgcal_workspace):
    root, data, cfg, C = hgcal_workspace
    model_loc = str(root / "ckpt" / "hgcal_cli_Diffusion" / "final.ckpt")
    gen_out = str(root / "generated_hgcal.h5")
    runner = CliRunner()
    result = runner.invoke(
        inference,
        ["-c", cfg, "-d", data, "--hgcal",
         "--checkpoint-folder", str(root / "ckpt"),
         "sample", "--sample-steps", "2", "--model-loc", model_loc,
         "-g", gen_out, "diffusion"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    with h5py.File(gen_out, "r") as f:
        assert f["showers"].shape == (32, 4, C)
        assert f["gen_info"].shape == (32, 3)
        assert np.all(np.isfinite(f["showers"][:]))


def test_cli_inference_hgcal_sparse(hgcal_workspace):
    root, data, cfg, C = hgcal_workspace
    model_loc = str(root / "ckpt" / "hgcal_cli_Diffusion" / "final.ckpt")
    gen_out = str(root / "generated_hgcal_sparse.h5")
    runner = CliRunner()
    result = runner.invoke(
        inference,
        ["-c", cfg, "-d", data, "--hgcal",
         "--checkpoint-folder", str(root / "ckpt"),
         "sample", "--sample-steps", "2", "--model-loc", model_loc,
         "--sparse-decoding", "-g", gen_out, "diffusion"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    with h5py.File(gen_out, "r") as f:
        dense_nonzero = None
        sparse = f["showers"][:]
        assert np.all(np.isfinite(sparse))
    # sparse decoding yields sparser showers than dense decoding
    with h5py.File(root / "generated_hgcal.h5", "r") as f:
        dense = f["showers"][:]
    assert (np.abs(sparse) > 1e-8).sum() < (np.abs(dense) > 1e-8).sum()
