"""Consistency distillation (train/train_distill.py): unit math + e2e.

The reference ships the Consistency SAMPLER (reference models/sample.py:
957-1011) with no trainer that could produce a model for it; these tests
cover the trainer that closes that loop and its handoff to the existing
sampler/checkpoint/CLI surfaces.
"""

import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from click.testing import CliRunner

from calodiffusion_tpu.samplers import schedules
from calodiffusion_tpu.train.train_distill import TrainDistillation
from calodiffusion_tpu.train.trainer import TrainDiffusion
from calodiffusion_tpu.training import train as train_cli
from calodiffusion_tpu.utils.config import default_flags
from tests.utils_test import fake_batch, tiny_ds2_config


def _tiny_cfg(**over):
    base = dict(
        VAL_FILES=["dataset_2_2.hdf5"], EVAL=["dataset_2_2.hdf5"],
        BATCH=8, MAXEPOCH=1, NSTEPS=8, CONSIS_NSTEPS=8,
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        CHECKPOINT_NAME="distill_test",
    )
    base.update(over)
    return tiny_ds2_config(**base)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill")
    data = root / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        n = 16
        showers = rng.exponential(1.0, (n, 6480)).astype(np.float32)
        showers[rng.uniform(size=showers.shape) < 0.8] = 0
        with h5py.File(data / fname, "w") as f:
            f.create_dataset("showers", data=showers)
            f.create_dataset(
                "incident_energies",
                data=rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32),
            )
    return root, str(data)


# ---------------------------------------------------------------- unit math

def test_sigma_grid_matches_consistency_sampler(workspace):
    """The distill grid must be exactly the sampler's sigma table
    (samplers/misc.py builds discrete_sigmas(CONSIS_NSTEPS), decreasing)."""
    root, data = workspace
    t = TrainDistillation(
        default_flags(data_folder=data), _tiny_cfg(), load_data=False,
        save_model=False,
    )
    grid = t._sigma_grid()
    assert np.all(np.diff(grid) > 0)  # increasing for the distill indexing
    np.testing.assert_allclose(grid[::-1], schedules.discrete_sigmas(8))


def test_distill_loss_stop_gradients(workspace):
    """No gradient may flow through the target network or the teacher: the
    consistency target is stop-gradient by construction (arXiv:2303.01469
    eq. 7) - a leak here silently turns distillation into self-matching."""
    root, data = workspace
    cfg = _tiny_cfg()
    # teacher = a fresh init (no checkpoint IO needed for the math check)
    teacher = TrainDiffusion(
        default_flags(data_folder=data), cfg, load_data=False,
        save_model=False,
    )
    teacher.init_model()
    t = TrainDistillation(
        default_flags(data_folder=data), cfg, load_data=False,
        save_model=False, teacher_params=teacher.params,
    )
    t.init_model()

    loss_fn, n_grid = t._distill_loss_fn()
    assert n_grid == 8
    data_b, E, layers = fake_batch(cfg, batch=4)
    idx = np.array([0, 2, 5, 6])
    noise = np.random.default_rng(1).standard_normal(data_b.shape).astype(
        np.float32
    )
    args = (jnp.asarray(data_b), jnp.asarray(E), jnp.asarray(layers),
            jnp.asarray(idx), jnp.asarray(noise))

    val = loss_fn(t.params, t.ema_params, t.teacher_params, *args)
    assert np.isfinite(float(val))

    g_target = jax.grad(loss_fn, argnums=1)(
        t.params, t.ema_params, t.teacher_params, *args
    )
    g_teacher = jax.grad(loss_fn, argnums=2)(
        t.params, t.ema_params, t.teacher_params, *args
    )
    for g in (g_target, g_teacher):
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves
        assert all(float(jnp.abs(leaf).max()) == 0.0 for leaf in leaves)

    # and the student path DOES carry gradient
    g_student = jax.grad(loss_fn, argnums=0)(
        t.params, t.ema_params, t.teacher_params, *args
    )
    total = sum(float(jnp.abs(leaf).sum())
                for leaf in jax.tree_util.tree_leaves(g_student))
    assert total > 0.0


def test_distill_ignores_teacher_earlystop(workspace):
    """The teacher's EARLYSTOP patience must not cut distillation short:
    the distill val metric plateaus early while the EMA target keeps
    improving.  DISTILL_EARLYSTOP opts back in."""
    root, data = workspace
    t = TrainDistillation(
        default_flags(data_folder=data), _tiny_cfg(EARLYSTOP=5),
        load_data=False, save_model=False,
    )
    assert t.config["EARLYSTOP"] >= 10**9
    t2 = TrainDistillation(
        default_flags(data_folder=data),
        _tiny_cfg(EARLYSTOP=5, DISTILL_EARLYSTOP=7),
        load_data=False, save_model=False,
    )
    assert t2.config["EARLYSTOP"] == 7


def test_idx_logits_lognormal_and_uniform(workspace):
    """Index-importance weights (arXiv:2310.14189 sec 3.5): a proper
    distribution over 0..N-2, more mass at mid/low sigma than the tail,
    and the "uniform" option recovers flat logits."""
    root, data = workspace
    t = TrainDistillation(
        default_flags(data_folder=data), _tiny_cfg(), load_data=False,
        save_model=False,
    )
    logits = t._idx_logits(8)
    p = np.exp(logits)
    assert p.shape == (7,)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    grid = t._sigma_grid()
    # lognormal(P_mean=-1.1) puts more mass near sigma~e^-1.1 than at the
    # largest-sigma end of the grid
    i_near = int(np.argmin(np.abs(np.log(grid[:-1]) + 1.1)))
    assert p[i_near] > p[-1]

    t2 = TrainDistillation(
        default_flags(data_folder=data),
        _tiny_cfg(DISTILL_IDX_DIST="uniform"), load_data=False,
        save_model=False,
    )
    np.testing.assert_array_equal(t2._idx_logits(8), np.zeros(7, np.float32))


# ----------------------------------------------------------------- e2e

@pytest.mark.slow
def test_distill_e2e_and_consistency_sampling(workspace):
    """Teacher train -> distill -> Consistency sampling at 1 and 2 steps
    through the standard checkpoint/inference path."""
    root, data = workspace
    cfg = _tiny_cfg()
    flags = default_flags(data_folder=data,
                          checkpoint_folder=str(root / "ckpt"))
    teacher = TrainDiffusion(flags, dict(cfg))
    teacher.train()
    teacher_loc = os.path.join(teacher.checkpoint_folder, "final.ckpt")

    dcfg = dict(cfg, TEACHER_LOC=teacher_loc, MAXEPOCH=2)
    student = TrainDistillation(
        default_flags(data_folder=data,
                      checkpoint_folder=str(root / "ckpt_distill")),
        dcfg,
    )
    model, params = student.train()
    assert os.path.exists(
        os.path.join(student.checkpoint_folder, "final.ckpt")
    )
    # target network moved away from the student (EMA decay < 1)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), student.params,
        student.ema_params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

    # the distilled checkpoint is a PLAIN CaloDiffusion checkpoint:
    # reload through the STANDARD TrainDiffusion inference path (which
    # prefers the EMA weights - for consistency models the EMA target net
    # is exactly what to sample from), no teacher required
    inf = TrainDiffusion(
        default_flags(
            data_folder=data,
            model_loc=os.path.join(student.checkpoint_folder, "final.ckpt"),
        ),
        dict(cfg, SAMPLER="Consistency"),
        load_data=False, save_model=False,
    )
    model, params = inf.load_for_inference()

    from calodiffusion_tpu.data.loader import load_data as load_data_fn

    for steps in (1, 2):
        eval_loader, _ = load_data_fn(default_flags(data_folder=data),
                                      dict(dcfg, SAMPLER="Consistency"),
                                      eval=True)
        gen, en = model.generate(params, jax.random.PRNGKey(0), eval_loader,
                                 sample_steps=steps)
        assert gen.shape == (16, 6480)
        assert np.all(np.isfinite(gen))
        assert en.shape[0] == 16


@pytest.mark.slow
def test_cli_distill(workspace):
    root, data = workspace
    cfg = _tiny_cfg(CHECKPOINT_NAME="cli_distill")
    cfg_path = root / "config_distill.json"
    cfg_path.write_text(json.dumps(cfg))
    runner = CliRunner()
    result = runner.invoke(
        train_cli,
        ["-c", str(cfg_path), "-d", data,
         "--checkpoint", str(root / "cli_ckpt"), "diffusion"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    teacher_loc = str(
        root / "cli_ckpt" / "cli_distill_Diffusion" / "final.ckpt"
    )
    result = runner.invoke(
        train_cli,
        ["-c", str(cfg_path), "-d", data,
         "--checkpoint", str(root / "cli_ckpt"), "distill",
         "--teacher-loc", teacher_loc],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert os.path.exists(
        root / "cli_ckpt" / "cli_distill_Distillation" / "final.ckpt"
    )
