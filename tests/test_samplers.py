"""Sampler numerics tests (coverage the reference lacks; SURVEY.md section 4).

Key idea: for data x0 ~ N(0, 1), the Bayes-optimal denoiser is
D(x, sigma) = x / (1 + sigma^2).  Feeding that closed-form denoiser to any
*consistent* reverse-diffusion sampler must produce samples that are again
~ N(0, 1).  This checks each sampler's update algebra end-to-end without a
neural network (fast, no conv compiles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calodiffusion_tpu.models.losses import hybrid_weight
from calodiffusion_tpu.samplers import get_sampler

CFG = {
    "NOISE_SCHED": "log",
    "NSTEPS": 400,
    "SAMPLER_OPTIONS": {},
    "CONSIS_NSTEPS": 100,
}


class DummyModel:
    """Protocol object standing in for CaloDiffusion with the closed-form
    optimal denoiser for unit-Gaussian data."""

    def __init__(self, nsteps=400):
        self.nsteps = nsteps
        self.loss_function = hybrid_weight(CFG, nsteps, "l2")

    def denoise(self, params, x, E=None, sigma=None, layers=None):
        return x / (1.0 + sigma**2)

    def noise_generation(self, key, shape):
        return jax.random.normal(key, shape, dtype=jnp.float32)


SAMPLERS_GAUSSIAN = [
    "DDim", "DDPM", "DPM", "DPMPP2S", "DPMPPSDE", "DPMPP2M", "DPMPP2MSDE",
    "DPMPP3MSDE", "Euler", "Heun", "DPM2", "LMS", "Restart",
]


@pytest.mark.parametrize("name", SAMPLERS_GAUSSIAN)
def test_sampler_preserves_gaussian(name):
    num_steps = 40
    batch, dim = 64, 256
    model = DummyModel(nsteps=num_steps)
    sampler = get_sampler(name)(dict(CFG))

    key = jax.random.PRNGKey(0)
    start = jax.random.normal(key, (batch, dim))
    E = jnp.ones((batch, 1))

    out = sampler(model, None, start, E, None, num_steps, 0,
                  jax.random.PRNGKey(1), False)
    out = np.asarray(out)
    assert out.shape == (batch, dim)
    assert np.all(np.isfinite(out))
    mean, std = float(out.mean()), float(out.std())
    # finite-step integrators have small bias; generous but meaningful gates
    assert abs(mean) < 0.1, f"{name}: mean {mean}"
    assert 0.8 < std < 1.25, f"{name}: std {std}"


def test_dpm_adaptive_runs():
    # cosine-schedule sigma_max is huge (~2.5e3 at 40 steps) so the default
    # k-diffusion tolerances under-gate on this toy; tighten them
    cfg = dict(CFG, SAMPLER_OPTIONS={"R_TOL": 0.001, "A_TOL": 1e-4})
    model = DummyModel(nsteps=40)
    sampler = get_sampler("DPMAdaptive")(cfg)
    start = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
    E = jnp.ones((8, 1))
    out = sampler(model, None, start, E, None, 40, 0, jax.random.PRNGKey(1),
                  False)
    out = np.asarray(out)
    assert out.shape == (8, 64)
    assert np.all(np.isfinite(out))
    assert 0.9 < float(out.std()) < 1.1


def test_consistency_runs():
    model = DummyModel(nsteps=100)
    sampler = get_sampler("Consistency")(dict(CFG))
    start = jax.random.normal(jax.random.PRNGKey(0), (16, 64))
    E = jnp.ones((16, 1))
    out = sampler(model, None, start, E, None, 5, 0, jax.random.PRNGKey(1),
                  False)
    out = np.asarray(out)
    assert out.shape == (16, 64)
    assert np.all(np.isfinite(out))


def test_bespoke_nonstationary_with_saved_theta(tmp_path):
    theta = np.stack([np.full(10, 0.5), np.full(10, 0.5)]).astype(np.float32)
    path = tmp_path / "theta.npy"
    np.save(path, theta)
    cfg = dict(CFG, SAMPLER_OPTIONS={"SAMPLER_PATH": str(path)})
    sampler = get_sampler("BespokeNonStationary")(cfg)
    model = DummyModel(nsteps=10)
    start = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    out = sampler(model, None, start, jnp.ones((4, 1)), None, 10, 0,
                  jax.random.PRNGKey(1), False)
    assert np.asarray(out).shape == (4, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_deterministic_ddpm_stochastic():
    model = DummyModel(nsteps=20)
    start = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    E = jnp.ones((4, 1))

    ddim = get_sampler("DDim")(dict(CFG))
    a = np.asarray(ddim(model, None, start, E, None, 20, 0,
                        jax.random.PRNGKey(1), False))
    b = np.asarray(ddim(model, None, start, E, None, 20, 0,
                        jax.random.PRNGKey(2), False))
    np.testing.assert_allclose(a, b, atol=1e-6)  # eta=0: noise-free

    ddpm = get_sampler("DDPM")(dict(CFG))
    c = np.asarray(ddpm(model, None, start, E, None, 20, 0,
                        jax.random.PRNGKey(1), False))
    d = np.asarray(ddpm(model, None, start, E, None, 20, 0,
                        jax.random.PRNGKey(2), False))
    assert np.abs(c - d).max() > 1e-3  # eta=1: stochastic


def test_sample_offset_shortens_trajectory():
    model = DummyModel(nsteps=20)
    start = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    E = jnp.ones((4, 1))
    ddim = get_sampler("DDim")(dict(CFG))
    out = ddim(model, None, start, E, None, 20, 5, jax.random.PRNGKey(1), False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_debug_returns_trajectory():
    model = DummyModel(nsteps=10)
    start = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
    E = jnp.ones((2, 1))
    ddim = get_sampler("DDim")(dict(CFG))
    x, xs, x0s = ddim(model, None, start, E, None, 10, 0,
                      jax.random.PRNGKey(1), True)
    assert np.asarray(xs).shape == (10, 2, 16)
    assert np.asarray(x0s).shape == (10, 2, 16)
    np.testing.assert_allclose(np.asarray(xs)[-1], np.asarray(x))


def test_restart_dense_list_applies_all_configs(monkeypatch):
    """Two restart configs mapping to the same nearest step index must BOTH
    run (the reference's dict comprehension silently drops one - a latent
    bug; intended semantics applied here)."""
    from calodiffusion_tpu.samplers.edm import Restart

    num_steps = 8
    model = DummyModel(nsteps=num_steps)
    cfg = dict(CFG)
    # t_min values 19.0 and 20.0 both map to the same coarse-grid index
    cfg["SAMPLER_OPTIONS"] = {"RESTART_LIST": {
        "0": [3, 1, 19.0, 40.0],
        "1": [3, 1, 20.0, 41.0],
        "2": [3, 1, 1.0, 2.0],
    }}
    sampler = Restart(cfg)

    calls = []
    orig = Restart._restart_block

    def spy(self, denoise, bs, ts, x, key, restart_idx, block_cfg):
        calls.append((restart_idx, tuple(block_cfg)))
        return orig(self, denoise, bs, ts, x, key, restart_idx, block_cfg)

    monkeypatch.setattr(Restart, "_restart_block", spy)
    key = jax.random.PRNGKey(0)
    start = jax.random.normal(key, (8, 32))
    out = sampler(model, None, start, jnp.ones((8, 1)), None, num_steps, 0,
                  jax.random.PRNGKey(1), False)
    assert np.isfinite(np.asarray(out)).all()
    assert len(calls) == 3  # every config applied, ties included
    applied = {c[1] for c in calls}
    assert (3, 1, 19.0, 40.0) in applied and (3, 1, 20.0, 41.0) in applied


@pytest.mark.parametrize("name", ["DPM", "BespokeNonStationary"])
def test_debug_without_x0_trajectory(name, tmp_path):
    """Samplers that expose no x0 trajectory must return x0s=None with a
    BATCH-INDEPENDENT xs, and the debug plot hook must tolerate the None
    (regression: DPM returned x0s=None that generate() np.asarray'd into
    a 0-d object array; BespokeNonStationary returned the batch-shaped
    start array in the x0 slot)."""
    steps, batch = 10, 2
    cfg = dict(CFG)
    if name == "BespokeNonStationary":
        theta = np.stack(
            [np.full(steps, 0.5), np.full(steps, 0.5)]
        ).astype(np.float32)
        path = tmp_path / "theta.npy"
        np.save(path, theta)
        cfg["SAMPLER_OPTIONS"] = {"SAMPLER_PATH": str(path)}
    model = DummyModel(nsteps=steps)
    sampler = get_sampler(name)(cfg)
    start = jax.random.normal(jax.random.PRNGKey(0), (batch, 16))
    x, xs, x0s = sampler(model, None, start, jnp.ones((batch, 1)), None,
                         steps, 0, jax.random.PRNGKey(1), True)
    assert x0s is None
    xs = np.asarray(xs)
    assert xs.ndim == 3 and xs.shape[1:] == (batch, 16)

    # the generate() debug hook must accept a None x0 trajectory
    from types import SimpleNamespace

    from calodiffusion_tpu.models.diffusion import CaloDiffusion

    dummy = SimpleNamespace(config={"CHECKPOINT_NAME": "t"})
    CaloDiffusion._debug_sample_plot(
        dummy, xs, None, np.asarray(start), plot_folder=str(tmp_path)
    )
    import os

    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


@pytest.mark.parametrize("name", ["Heun", "DPM2", "DPMPP2S"])
def test_debug_last_frame_is_returned_sample(name):
    """The debug trajectory's last frame must BE the returned sample —
    regression: the second-order EDM samplers omitted their post-scan
    final Euler step and DPMPP2S its post-loop ancestral noise, so the
    'final-step' debug histogram was not the output distribution."""
    steps, batch = 12, 4
    model = DummyModel(nsteps=steps)
    sampler = get_sampler(name)(dict(CFG))
    start = jax.random.normal(jax.random.PRNGKey(0), (batch, 16))
    x, xs, _ = sampler(model, None, start, jnp.ones((batch, 1)), None,
                       steps, 0, jax.random.PRNGKey(1), True)
    np.testing.assert_allclose(np.asarray(xs)[-1], np.asarray(x),
                               rtol=1e-6, atol=1e-6)
