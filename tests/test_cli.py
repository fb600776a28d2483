"""CLI-level smoke tests (the reference's test strategy: drive the installed
CLIs end-to-end on tiny data; reference tests/test_execution.py).  Uses
click's CliRunner in-process so the conftest's CPU/compile-cache setup
applies."""

import json
import os

import h5py
import numpy as np
import pytest
from click.testing import CliRunner

from calodiffusion_tpu.inference import inference
from calodiffusion_tpu.training import train
from tests.utils_test import tiny_ds2_config

pytestmark = pytest.mark.slow  # chained CLI train->infer->plot, ~5 min


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = root / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        n = 32
        showers = rng.exponential(1.0, (n, 6480)).astype(np.float32)
        showers[rng.uniform(size=showers.shape) < 0.8] = 0
        with h5py.File(data / fname, "w") as f:
            f.create_dataset("showers", data=showers)
            f.create_dataset(
                "incident_energies",
                data=rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32),
            )
    cfg = tiny_ds2_config(
        EVAL=["dataset_2_2.hdf5"],
        VAL_FILES=["dataset_2_2.hdf5"],
        BATCH=16, MAXEPOCH=1, NSTEPS=4,
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        CHECKPOINT_NAME="cli_test",
    )
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    return root, str(data), str(cfg_path)


def test_cli_train_diffusion(workspace):
    root, data, cfg = workspace
    runner = CliRunner()
    result = runner.invoke(
        train,
        ["-c", cfg, "-d", data, "--checkpoint", str(root / "ckpt"),
         "diffusion"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert os.path.exists(root / "ckpt" / "cli_test_Diffusion" / "final.ckpt")


def test_cli_inference_diffusion(workspace):
    root, data, cfg = workspace
    model_loc = str(root / "ckpt" / "cli_test_Diffusion" / "final.ckpt")
    gen_out = str(root / "generated_cli.h5")
    runner = CliRunner()
    result = runner.invoke(
        inference,
        ["-c", cfg, "-d", data, "--checkpoint-folder", str(root / "ckpt"),
         "sample", "--sample-steps", "2", "--model-loc", model_loc,
         "-g", gen_out, "diffusion"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    with h5py.File(gen_out, "r") as f:
        assert f["showers"].shape == (32, 6480)
        assert f["incident_energies"].shape == (32, 1)
        assert np.all(np.isfinite(f["showers"][:]))


def test_cli_plot(workspace):
    root, data, cfg = workspace
    gen_out = str(root / "generated_cli.h5")
    runner = CliRunner()
    result = runner.invoke(
        inference,
        ["-c", cfg, "-d", data, "-n", "10", "plot", "-g", gen_out,
         "--plot-folder", str(root / "plots")],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    plot_dir = root / "plots" / "cli_test"
    assert plot_dir.exists()
    assert len(list(plot_dir.glob("*.png"))) > 5


def test_cli_train_layer(workspace):
    root, data, cfg = workspace
    runner = CliRunner()
    result = runner.invoke(
        train,
        ["-c", cfg, "-d", data, "--checkpoint", str(root / "ckpt"), "layer"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert os.path.exists(root / "ckpt" / "cli_test_LayerModel" / "final.ckpt")


def test_cli_inference_layer(workspace):
    root, data, cfg = workspace
    model_loc = str(root / "ckpt" / "cli_test_Diffusion" / "final.ckpt")
    layer_loc = str(root / "ckpt" / "cli_test_LayerModel" / "final.ckpt")
    gen_out = str(root / "generated_layer.h5")
    runner = CliRunner()
    result = runner.invoke(
        inference,
        ["-c", cfg, "-d", data, "--checkpoint-folder", str(root / "ckpt"),
         "sample", "--sample-steps", "2", "--model-loc", model_loc,
         "-g", gen_out, "layer", "--layer-model", layer_loc],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    with h5py.File(gen_out, "r") as f:
        assert f["showers"].shape == (32, 6480)
