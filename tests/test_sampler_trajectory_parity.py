"""Golden sampler-TRAJECTORY parity against the actual reference samplers
(VERDICT round-2 #1: the last fidelity hole).

Method: both frameworks get the SAME closed-form denoiser
``x0 = x / (1 + sigma^2)`` (elementwise, sigma-dependent, no weights needed),
the same start array, and — for stochastic samplers — the same injected
noise table (ours via ``Sample.set_noise_table``, the reference via its
``randn_like`` parameter or monkeypatched ``torch.randn``/``randn_like``).
Per-step states are then compared: ours from the samplers' ``debug``
trajectories, the reference's from its returned ``xs`` or from a
denoiser-call recorder.

This isolates the sampler numerics exactly: schedules, ancestral steps,
churn, multistep history, solver coefficients.  Combined with the
weight-transfer denoise() parity matrix (test_torch_parity_matrix.py) it
proves end-to-end generate() parity — which test_generate_cross_framework
below also checks directly on a real tiny ds2 model.

Intended deviations (PARITY.md "Intended deviations") are ASSERTED here as
the only divergences:
  - Heun: the reference evaluates the corrector slope at a stale state
    (models/sample.py:820 ``(self.x_next - denoised)``, utils/sampling.py:316
    — ``x_next`` still holds the step's starting x), an O(h) bug that demotes
    Heun to 1st order; we use the Euler-stepped point (NVlabs EDM form).
    Numpy simulations of BOTH forms pin each framework to its form.
  - Heun/DPM2 final step: the reference class API applies the 2nd-order
    corrector at sigma_next=0 (division by zero -> non-finite garbage); the
    reference's own legacy edm_sampler (utils/sampling.py:232) forces an
    Euler last step, as do we.
  - DPMAdaptive: the reference unpacks ``noise_sampler(...)`` (a single
    (B,...) tensor) into two variables (models/sample.py:262) — a hard crash
    for batch != 2; its PIDStepSizeControl.update_h never assigns self.h
    (utils/sampling.py:1281-1290).  Asserted broken here; ours implements
    the written intent (covered by test_samplers.py self-consistency).
  - SDE samplers (DPMPPSDE/2MSDE/3MSDE): Brownian-tree replaced by
    per-interval normals — same marginal law, different sequences under
    PRNG.  With the SAME noise values injected on both sides (ours via
    ``set_noise_table``, the reference via a table-driven
    ``BrownianTreeNoiseSampler`` stand-in) the solver coefficients are
    exactly comparable, and the test_*sde tests below assert final-state
    agreement — so the ONLY divergence left is the noise source itself.

Reference lines cited per test.  Skipped when /root/reference or torch is
unavailable (CI clones the reference and hard-requires it, see test.yml).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = os.environ.get("CALODIF_REFERENCE_ROOT", "/root/reference")

_ref_available = os.path.exists(os.path.join(REFERENCE_ROOT, "calodiffusion"))
pytestmark = [
    pytest.mark.skipif(not _ref_available, reason="reference checkout not available"),
]

if os.environ.get("CALODIF_REQUIRE_REFERENCE"):
    import torch
else:
    torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _load_ref(name):
    from bench_baselines.reference_torch import _stub_missing_modules

    _stub_missing_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module(name)


# ---------------------------------------------------------------------------
# shared closed-form denoiser + fake models
# ---------------------------------------------------------------------------

SHAPE = (3, 2, 4, 5)  # batch 3 (odd batch also trips the DPMAdaptive bug)
NSTEPS = 16  # discrete-schedule samplers
NSTEPS_EDM = 12  # Karras-grid samplers


class _FakeTorchLoss:
    """Mirror of the reference model's loss_function table surface
    (reference models/sample.py:146-153 create_sigmas reads these)."""

    def __init__(self, nsteps):
        self.update_step(nsteps)

    def update_step(self, nsteps):
        sampling = _load_ref("calodiffusion.utils.sampling")
        betas = sampling.cosine_beta_schedule(nsteps)
        alphas_cumprod = torch.cumprod(1.0 - betas, axis=0)
        self.sqrt_alphas_cumprod = torch.sqrt(alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = torch.sqrt(1.0 - alphas_cumprod)


class _FakeTorchModel:
    def __init__(self, nsteps=NSTEPS):
        self.nsteps = nsteps
        self.loss_function = _FakeTorchLoss(nsteps)

    def denoise(self, x, sigma=None, E=None, layers=None):
        sigma = torch.as_tensor(sigma, dtype=torch.float32)
        while sigma.dim() < x.dim():
            sigma = sigma.unsqueeze(-1)
        return x / (1.0 + sigma**2)

    def __call__(self, x, sigma=None, E=None, layers=None):
        return self.denoise(x, sigma=sigma)


class _TorchRecorder:
    """Wraps a torch model; logs every denoiser call's (x, sigma, x0)."""

    def __init__(self, model):
        self.model = model
        self.nsteps = model.nsteps
        self.loss_function = model.loss_function
        self.xs, self.sigmas, self.x0s = [], [], []

    def denoise(self, x, sigma=None, E=None, layers=None):
        out = self.model.denoise(x, sigma=sigma)
        self.xs.append(x.detach().clone().numpy())
        self.sigmas.append(float(torch.as_tensor(sigma).reshape(-1)[0]))
        self.x0s.append(out.detach().clone().numpy())
        return out

    def __call__(self, x, sigma=None, E=None, layers=None):
        return self.denoise(x, sigma=sigma)


class _FakeJaxLoss:
    def update_step(self, nsteps):
        pass


class _FakeJaxModel:
    def __init__(self, nsteps=NSTEPS):
        self.nsteps = nsteps
        self.loss_function = _FakeJaxLoss()

    def denoise(self, params, x, E=None, sigma=None, layers=None):
        sigma = jnp.asarray(sigma, jnp.float32)
        while sigma.ndim < x.ndim:
            sigma = sigma[..., None]
        return x / (1.0 + sigma**2)


def _start(seed=0):
    return np.random.default_rng(seed).standard_normal(SHAPE).astype(np.float32)


def _noise_table(n, seed=7):
    return (
        np.random.default_rng(seed)
        .standard_normal((n, *SHAPE))
        .astype(np.float32)
    )


def _make_torch_randn(table):
    """(randn_like, randn, cursor) consuming rows of ``table`` in order."""
    cursor = [0]

    def randn_like(t, **kw):
        row = table[cursor[0]]
        cursor[0] += 1
        return torch.from_numpy(row.copy())

    def randn(*shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        row = table[cursor[0]]
        cursor[0] += 1
        assert tuple(shape) == row.shape, (shape, row.shape)
        return torch.from_numpy(row.copy())

    return randn_like, randn, cursor


def _run_ours(sampler_cls, config, num_steps, start, noise_table=None,
              debug=True, model=None):
    from calodiffusion_tpu.samplers.base import Sample  # noqa: F401

    model = model or _FakeJaxModel(num_steps)
    s = sampler_cls(dict(config))
    if noise_table is not None:
        s.set_noise_table(noise_table)
    out = s(
        model, None, jnp.asarray(start), energy=None, layers=None,
        num_steps=num_steps, sample_offset=0, key=jax.random.PRNGKey(0),
        debug=debug,
    )
    if debug:
        x, xs, x0s = out
        return (
            np.asarray(x),
            None if xs is None else np.asarray(xs),
            None if x0s is None else np.asarray(x0s),
            s,
        )
    return np.asarray(out), None, None, s


# ---------------------------------------------------------------------------
# foundation: the discrete sigma ladder matches the reference's tables
# ---------------------------------------------------------------------------


def test_schedule_tables_match_reference():
    """Our host-side cosine/alpha-bar tables == the reference's torch tables
    (reference utils/sampling.py:16-24, models/sample.py:146-153)."""
    from calodiffusion_tpu.samplers import schedules

    sampling = _load_ref("calodiffusion.utils.sampling")
    for n in (NSTEPS, 37, 400):
        betas_ref = sampling.cosine_beta_schedule(n).numpy()
        # betas suffer catastrophic cancellation (1 - acp[i+1]/acp[i]) in the
        # reference's f32 pipeline; ours is f64.  ~2.7e-4 relative at n=400.
        np.testing.assert_allclose(
            schedules.cosine_beta_schedule(n), betas_ref, rtol=5e-4, atol=1e-7
        )
        acp_ref = torch.cumprod(1.0 - sampling.cosine_beta_schedule(n), dim=0)
        sig_ref = (
            torch.sqrt(1.0 - acp_ref) / torch.sqrt(acp_ref)
        ).numpy()[::-1].copy()
        np.testing.assert_allclose(
            schedules.discrete_sigmas(n), sig_ref, rtol=2e-4
        )


# ---------------------------------------------------------------------------
# DDim / DDPM (reference models/sample.py:29-121)
# ---------------------------------------------------------------------------


def test_ddim_trajectory():
    sample = _load_ref("calodiffusion.models.sample")
    start = _start()
    ref_model = _FakeTorchModel(NSTEPS)
    with torch.no_grad():
        x_ref, xs_ref, x0s_ref = sample.DDim({})(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS, 0, debug=True,
        )
    from calodiffusion_tpu.samplers.ddpm import DDim

    x, xs, x0s, _ = _run_ours(DDim, {}, NSTEPS, start)
    assert xs.shape[0] == len(xs_ref) == NSTEPS
    for t in range(NSTEPS):
        np.testing.assert_allclose(
            xs[t], xs_ref[t].numpy(), rtol=5e-4, atol=5e-4,
            err_msg=f"DDim x diverges at step {t}",
        )
        np.testing.assert_allclose(
            x0s[t], x0s_ref[t].numpy(), rtol=5e-4, atol=5e-4,
            err_msg=f"DDim x0 diverges at step {t}",
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=5e-4, atol=5e-4)


def test_ddpm_trajectory_injected_noise(monkeypatch):
    """DDPM draws one normal per step (reference sample.py:94); with the
    same table on both sides the stochastic trajectories must match."""
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(1)
    table = _noise_table(NSTEPS)
    randn_like, randn, cursor = _make_torch_randn(table)
    monkeypatch.setattr(torch, "randn", randn)

    ref_model = _FakeTorchModel(NSTEPS)
    with torch.no_grad():
        x_ref, xs_ref, _ = sample.DDPM({})(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS, 0, debug=True,
        )
    assert cursor[0] == NSTEPS

    from calodiffusion_tpu.samplers.ddpm import DDPM

    x, xs, _, s = _run_ours(DDPM, {}, NSTEPS, start, noise_table=table)
    assert s.noise_draws == NSTEPS
    for t in range(NSTEPS):
        np.testing.assert_allclose(
            xs[t], xs_ref[t].numpy(), rtol=5e-4, atol=5e-4,
            err_msg=f"DDPM x diverges at step {t}",
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Euler (reference models/sample.py:771-789 + for_loop :631-657)
# ---------------------------------------------------------------------------


def _edm_cfg(noisy=False):
    return {"NOISY_SAMPLE": noisy, "SAMPLER_OPTIONS": {}}


@pytest.mark.parametrize("noisy", [False, True])
def test_euler_trajectory(noisy, monkeypatch):
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(2)
    table = _noise_table(NSTEPS_EDM, seed=11)
    randn_like, randn, cursor = _make_torch_randn(table)
    monkeypatch.setattr(torch, "randn_like", randn_like)

    ref_model = _FakeTorchModel(NSTEPS_EDM)
    with torch.no_grad():
        x_ref, xs_ref, x0s_ref = sample.Euler(_edm_cfg(noisy))(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS_EDM, 0, debug=True,
        )
    assert cursor[0] == NSTEPS_EDM  # one churn draw per step, even gamma=0

    from calodiffusion_tpu.samplers.edm import Euler

    x, xs, x0s, s = _run_ours(
        Euler, _edm_cfg(noisy), NSTEPS_EDM, start, noise_table=table
    )
    assert s.noise_draws == NSTEPS_EDM
    # reference xs[i] = x BEFORE step i; ours xs[i] = x AFTER step i
    for t in range(NSTEPS_EDM - 1):
        np.testing.assert_allclose(
            xs[t], xs_ref[t + 1].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"Euler(noisy={noisy}) x diverges at step {t}",
        )
    for t in range(NSTEPS_EDM):
        np.testing.assert_allclose(
            x0s[t], x0s_ref[t].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"Euler(noisy={noisy}) denoised diverges at step {t}",
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Heun: stale-slope quirk + final-step deviation, both pinned by simulation
# ---------------------------------------------------------------------------


def _karras_ts(num_steps, sigma_min=0.002, sigma_max=80.0, rho=7):
    from calodiffusion_tpu.samplers import schedules

    t = schedules.karras_steps(num_steps, sigma_min, sigma_max, rho)
    return np.concatenate([t.astype(np.float64), [0.0]])


def _den_np(x, t):
    return x / (1.0 + t**2)


def _sim_heun(start, ts, stale, euler_last):
    """Numpy Heun walk (gamma=0).  stale=True reproduces the reference's
    d_prime = (x_at_step_start - den2)/t_next quirk; euler_last=True takes
    the plain Euler step at sigma_next=0 (legacy edm_sampler behavior and
    ours), False applies the corrector there (reference class API: div 0)."""
    x = start.astype(np.float64) * ts[0]
    xs = []
    T = len(ts) - 1
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(T):
            t_hat, t_next = ts[i], ts[i + 1]
            x_hat = x
            den = _den_np(x_hat, t_hat)
            d_cur = (x_hat - den) / t_hat
            h = t_next - t_hat
            if euler_last and i == T - 1:
                x = x_hat + h * d_cur
            else:
                x_prime = x_hat + h * d_cur
                den2 = _den_np(x_prime, t_next)
                base = x_hat if stale else x_prime
                d_prime = (base - den2) / t_next
                x = x_hat + h * (0.5 * d_cur + 0.5 * d_prime)
            xs.append(x.copy())
    return np.stack(xs)


def test_heun_ours_is_nvlabs_form():
    """Our Heun == the intended NVlabs form (corrector slope at the
    Euler-stepped point), Euler final step."""
    from calodiffusion_tpu.samplers.edm import Heun

    start = _start(3)
    ts = _karras_ts(NSTEPS_EDM)
    sim = _sim_heun(start, ts, stale=False, euler_last=True)
    x, xs, _, _ = _run_ours(Heun, _edm_cfg(), NSTEPS_EDM, start)
    # ours' debug xs cover the main scan (steps 0..T-2); final x is the
    # Euler last step
    for t in range(NSTEPS_EDM - 1):
        np.testing.assert_allclose(
            xs[t], sim[t], rtol=1e-3, atol=1e-3,
            err_msg=f"our Heun deviates from NVlabs form at step {t}",
        )
    np.testing.assert_allclose(x, sim[-1], rtol=1e-3, atol=1e-3)


def test_heun_reference_class_has_stale_slope_and_div0_last_step():
    """The reference class Heun (models/sample.py:820) == the stale-slope
    simulation with the corrector applied at sigma=0 on the last step; this
    pins the intended deviation exactly."""
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(3)
    ref_model = _FakeTorchModel(NSTEPS_EDM)
    with torch.no_grad():
        x_ref, xs_ref, _ = sample.Heun(_edm_cfg())(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS_EDM, 0, debug=True,
        )
    ts = _karras_ts(NSTEPS_EDM)
    sim_stale = _sim_heun(start, ts, stale=True, euler_last=False)
    sim_intended = _sim_heun(start, ts, stale=False, euler_last=True)
    # per-step: reference == stale-slope form (xs_ref[i] = x before step i)
    for t in range(NSTEPS_EDM - 1):
        np.testing.assert_allclose(
            xs_ref[t + 1].numpy(), sim_stale[t], rtol=1e-3, atol=1e-3,
            err_msg=f"reference Heun != stale-slope sim at step {t}",
        )
        # and from the very first step it is NOT the intended form
        if t == 0:
            assert not np.allclose(
                xs_ref[t + 1].numpy(), sim_intended[t], rtol=1e-5, atol=1e-6
            ), "stale-slope quirk vanished — update PARITY.md"
    # last step: corrector at sigma=0 -> non-finite garbage in the class API
    assert not np.isfinite(x_ref.numpy()).all()


def test_heun_legacy_sampler_matches_stale_sim_with_euler_last(monkeypatch):
    """The legacy edm_sampler('heun') (utils/sampling.py:310-317) has the
    same stale slope but forces an Euler last step (:232)."""
    sampling = _load_ref("calodiffusion.utils.sampling")
    start = _start(3)
    table = _noise_table(NSTEPS_EDM, seed=13)
    randn_like, _, cursor = _make_torch_randn(table)
    ref_model = _FakeTorchModel(NSTEPS_EDM)
    with torch.no_grad():
        x_ref, xs_ref, _ = sampling.edm_sampler(
            ref_model, torch.from_numpy(start.copy()), None, None,
            sample_algo="heun", randn_like=randn_like,
            num_steps=NSTEPS_EDM, sigma_min=0.002, sigma_max=80.0,
            S_churn=0, S_min=0.01, S_max=1.0, S_noise=1.003,
            extra_args={},
        )
    ts = _karras_ts(NSTEPS_EDM)
    sim = _sim_heun(start, ts, stale=True, euler_last=True)
    np.testing.assert_allclose(x_ref.numpy(), sim[-1], rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# DPM2 (reference class :824-850, legacy :234-243)
# ---------------------------------------------------------------------------


def test_dpm2_trajectory_matches_legacy(monkeypatch):
    """Ours == the reference's legacy edm_sampler('dpm2') exactly (both take
    the Euler last step); the class API (corrector at sigma=0 on the last
    step) agrees on every step but the last, where it goes non-finite."""
    sampling = _load_ref("calodiffusion.utils.sampling")
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(4)
    # two reference runs (legacy + class) share the cursor; all draws are
    # multiplied by churn=0 here, so only the count matters
    table = _noise_table(2 * NSTEPS_EDM, seed=17)
    randn_like, randn, cursor = _make_torch_randn(table)

    ref_model = _FakeTorchModel(NSTEPS_EDM)
    with torch.no_grad():
        x_leg, xs_leg, _ = sampling.edm_sampler(
            ref_model, torch.from_numpy(start.copy()), None, None,
            sample_algo="dpm2", randn_like=randn_like,
            num_steps=NSTEPS_EDM, sigma_min=0.002, sigma_max=80.0,
            S_churn=0, S_min=0.01, S_max=1.0, S_noise=1.003,
            extra_args={},
        )

    from calodiffusion_tpu.samplers.edm import DPM2

    x, xs, _, _ = _run_ours(DPM2, _edm_cfg(), NSTEPS_EDM, start)
    # legacy xs[i] = x before step i
    for t in range(NSTEPS_EDM - 1):
        np.testing.assert_allclose(
            xs[t], xs_leg[t + 1].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"DPM2 diverges from legacy at step {t}",
        )
    np.testing.assert_allclose(x, x_leg.numpy(), rtol=1e-3, atol=1e-3)

    # class API: identical until the final step, then div-by-zero garbage
    monkeypatch.setattr(torch, "randn_like", randn_like)
    with torch.no_grad():
        x_cls, xs_cls, _ = sample.DPM2(_edm_cfg())(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS_EDM, 0, debug=True,
        )
    for t in range(NSTEPS_EDM - 1):
        np.testing.assert_allclose(
            xs_cls[t + 1].numpy(), xs[t], rtol=1e-3, atol=1e-3
        )
    assert not np.isfinite(x_cls.numpy()).all()


# ---------------------------------------------------------------------------
# LMS (reference class :729-768)
# ---------------------------------------------------------------------------


def test_lms_trajectory():
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(5)
    ref_model = _TorchRecorder(_FakeTorchModel(NSTEPS_EDM))
    with torch.no_grad():
        x_ref, _, _ = sample.LMS(_edm_cfg())(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS_EDM, 0, debug=True,
        )
    from calodiffusion_tpu.samplers.edm import LMS

    x, xs, x0s, _ = _run_ours(LMS, _edm_cfg(), NSTEPS_EDM, start)
    # the recorder's call inputs are x before each step; ours xs are after
    assert len(ref_model.xs) == NSTEPS_EDM
    for t in range(NSTEPS_EDM - 1):
        np.testing.assert_allclose(
            xs[t], ref_model.xs[t + 1], rtol=1e-3, atol=1e-3,
            err_msg=f"LMS diverges at step {t}",
        )
        np.testing.assert_allclose(
            x0s[t], ref_model.x0s[t], rtol=1e-3, atol=1e-3
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# DPM-Solver fast (reference class :124-185 via utils/sampling.py DPMSolver)
# ---------------------------------------------------------------------------


def test_dpm_fast_per_segment():
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(6)
    ref_model = _TorchRecorder(_FakeTorchModel(NSTEPS))
    with torch.no_grad():
        x_ref, _, _ = sample.DPM({})(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS, 0, debug=True,
        )
    from calodiffusion_tpu.samplers.dpm import DPM

    x, seg_xs, _, _ = _run_ours(DPM, {}, NSTEPS, start)
    # order-3 segments make 3 denoiser calls each; the reference's call at
    # each segment boundary takes our per-segment state as input
    m = 3
    boundaries = [i for i in range(m, len(ref_model.xs), m)]
    for si, ci in enumerate(boundaries[: len(seg_xs) - 1]):
        np.testing.assert_allclose(
            seg_xs[si], ref_model.xs[ci], rtol=2e-3, atol=2e-3,
            err_msg=f"DPM fast diverges after segment {si}",
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# DPM++ 2S / 2M (reference :311-344, :415-449)
# ---------------------------------------------------------------------------


def test_dpmpp2s_trajectory():
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(7)
    ref_model = _TorchRecorder(_FakeTorchModel(NSTEPS))
    with torch.no_grad():
        x_ref, _, _ = sample.DPMPP2S({})(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS, 0, debug=True,
        )
    from calodiffusion_tpu.samplers.dpm import DPMPP2S

    x, xs, _, _ = _run_ours(DPMPP2S, {}, NSTEPS, start)
    # 2 denoiser calls per step; call 2k's input = x before step k
    n_steps_ref = len(ref_model.xs) // 2
    assert xs.shape[0] == n_steps_ref
    for t in range(n_steps_ref - 1):
        np.testing.assert_allclose(
            xs[t], ref_model.xs[2 * (t + 1)], rtol=1e-3, atol=1e-3,
            err_msg=f"DPMPP2S diverges at step {t}",
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=1e-3, atol=1e-3)


def test_dpmpp2m_trajectory():
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(8)
    ref_model = _TorchRecorder(_FakeTorchModel(NSTEPS))
    with torch.no_grad():
        x_ref, _, _ = sample.DPMPP2M({})(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS, 0, debug=True,
        )
    from calodiffusion_tpu.samplers.dpm import DPMPP2M

    x, xs, x0s, _ = _run_ours(DPMPP2M, {}, NSTEPS, start)
    assert len(ref_model.xs) == NSTEPS - 1
    for t in range(len(ref_model.xs) - 1):
        np.testing.assert_allclose(
            xs[t], ref_model.xs[t + 1], rtol=1e-3, atol=1e-3,
            err_msg=f"DPMPP2M diverges at step {t}",
        )
        np.testing.assert_allclose(
            x0s[t], ref_model.x0s[t], rtol=1e-3, atol=1e-3
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Restart (golden: legacy edm_sampler('restart'), utils/sampling.py:245-306 —
# the class API's restarts never fire: int `in` str-keyed dict, sample.py:878)
# ---------------------------------------------------------------------------


def test_restart_with_injected_noise():
    sampling = _load_ref("calodiffusion.utils.sampling")
    start = _start(9)
    # distinct step indices (tie handling is itself an intended deviation,
    # covered by test_samplers.py)
    restart_list = {"0": [4, 1, 1.09, 1.92], "1": [3, 2, 0.06, 0.30]}
    import json as _json

    n_draws = 200  # generous; both sides must consume the same count
    table = _noise_table(n_draws, seed=23)
    randn_like, _, cursor = _make_torch_randn(table)
    ref_model = _FakeTorchModel(NSTEPS_EDM)
    with torch.no_grad():
        x_ref, _, _ = sampling.edm_sampler(
            ref_model, torch.from_numpy(start.copy()), None, None,
            sample_algo="restart", randn_like=randn_like,
            num_steps=NSTEPS_EDM, sigma_min=0.002, sigma_max=80.0,
            S_churn=0, S_min=0.01, S_max=1.0, S_noise=1.003,
            restart_info=_json.dumps(restart_list), restart_gamma=0.05,
            extra_args={},
        )
    ref_draws = cursor[0]

    from calodiffusion_tpu.samplers.edm import Restart

    cfg = {
        "NOISY_SAMPLE": False,
        "SAMPLER_OPTIONS": {"RESTART_LIST": restart_list},
    }
    x, _, _, s = _run_ours(
        Restart, cfg, NSTEPS_EDM, start, noise_table=table
    )
    assert s.noise_draws == ref_draws, (
        f"noise-draw sequences diverge: ours {s.noise_draws}, "
        f"reference {ref_draws}"
    )
    assert ref_draws > NSTEPS_EDM, "restarts never fired — test is vacuous"
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=2e-3, atol=2e-3)


def test_restart_class_api_restarts_never_fire(monkeypatch):
    """Documents the reference class bug our Restart intentionally fixes:
    `index + 1 in self.restart_list.keys()` compares int to str keys
    (models/sample.py:878), so the class API degenerates to plain Euler."""
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(9)
    table = _noise_table(NSTEPS_EDM, seed=29)
    randn_like, _, cursor = _make_torch_randn(table)
    monkeypatch.setattr(torch, "randn_like", randn_like)
    ref_model = _FakeTorchModel(NSTEPS_EDM)
    with torch.no_grad():
        x_restart, _, _ = sample.Restart(_edm_cfg())(
            ref_model, torch.from_numpy(start.copy()), None, None,
            NSTEPS_EDM, 0, debug=True,
        )
    # exactly one churn draw per main step — no restart draws ever happened
    assert cursor[0] == NSTEPS_EDM


# ---------------------------------------------------------------------------
# Consistency (reference :957-1011 + utils/sampling.py:1143-1173)
# ---------------------------------------------------------------------------


def test_consistency_trajectory(monkeypatch):
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(10)
    n_steps = 4  # uses CONSIS_NSTEPS-schedule fractions
    table = _noise_table(8, seed=31)
    randn_like, _, cursor = _make_torch_randn(table)
    monkeypatch.setattr(torch, "randn_like", randn_like)
    ref_model = _FakeTorchModel(NSTEPS)
    with torch.no_grad():
        x_ref, xs_ref, _ = sample.Consistency({"CONSIS_NSTEPS": 100})(
            ref_model, torch.from_numpy(start.copy()), None, None,
            n_steps, 0, debug=True,
        )
    ref_draws = cursor[0]

    from calodiffusion_tpu.samplers.misc import Consistency

    x, xs, _, s = _run_ours(
        Consistency, {"CONSIS_NSTEPS": 100}, n_steps, start,
        noise_table=table, model=_FakeJaxModel(NSTEPS),
    )
    assert s.noise_draws == ref_draws
    assert xs.shape[0] == len(xs_ref)
    for t in range(len(xs_ref)):
        np.testing.assert_allclose(
            xs[t], xs_ref[t].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"Consistency diverges at step {t}",
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# DPMAdaptive: the reference path is unrunnable (intended deviation #3)
# ---------------------------------------------------------------------------


def test_dpmadaptive_reference_is_broken():
    """models/sample.py:262 unpacks noise_sampler(...) — one (B, ...) tensor
    — into two variables: crashes for any batch != 2.  (Its PID controller
    also never updates h: utils/sampling.py:1281-1290.)  Ours implements
    the written intent; self-consistency covered in test_samplers.py."""
    sample = _load_ref("calodiffusion.models.sample")
    ref_model = _FakeTorchModel(NSTEPS)
    start = _start(11)  # batch 3
    with pytest.raises((ValueError, RuntimeError)):
        with torch.no_grad():
            sample.DPMAdaptive({})(
                ref_model, torch.from_numpy(start.copy()), None, None,
                NSTEPS, 0, debug=True,
            )


# ---------------------------------------------------------------------------
# end-to-end: real tiny ds2 model, transferred weights, same start noise
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# SDE samplers (reference models/sample.py:347-412, 452-516, 519-574):
# with identical injected noise the paths are deterministic and must match.
# ---------------------------------------------------------------------------


class _TableBrownian:
    """Stand-in for sampling.BrownianTreeNoiseSampler returning table rows
    in call order (the reference draws once per __call__)."""

    def __init__(self, table):
        self.table = table
        self.calls = 0

    def __call__(self, s0, s1):
        row = self.table[self.calls]
        self.calls += 1
        return torch.from_numpy(row.copy())


def _run_ref_sde(monkeypatch, cls_name, config, table, num_steps=NSTEPS):
    sample = _load_ref("calodiffusion.models.sample")
    tb = _TableBrownian(table)
    monkeypatch.setattr(
        sample.sampling, "BrownianTreeNoiseSampler", lambda x, smin, smax: tb
    )
    ref_model = _FakeTorchModel(num_steps)
    with torch.no_grad():
        x_ref, _, _ = getattr(sample, cls_name)(dict(config))(
            ref_model, torch.from_numpy(_start().copy()), None, None,
            num_steps, 0, debug=True,
        )
    return np.asarray(x_ref), tb.calls


@pytest.mark.parametrize("eta", [0.0, 0.4])
def test_dpmppsde_trajectory_injected_noise(monkeypatch, eta):
    """Reference draws twice per step — after each half-step
    (sample.py:369-412) — independent of eta; with the same table both
    frameworks must land on the same final state."""
    cfg = {"SAMPLER_OPTIONS": {"ETA": eta, "R": 0.5}}
    table = _noise_table(2 * (NSTEPS - 1), seed=23)
    x_ref, calls = _run_ref_sde(monkeypatch, "DPMPPSDE", cfg, table)
    assert calls == 2 * (NSTEPS - 1)

    from calodiffusion_tpu.samplers.dpm import DPMPPSDE

    x, _, _, s = _run_ours(DPMPPSDE, cfg, NSTEPS, _start(), noise_table=table)
    assert s.noise_draws == calls
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("solver", ["heun", "midpoint"])
@pytest.mark.parametrize("eta", [0.0, 0.4])
def test_dpmpp2msde_trajectory_injected_noise(monkeypatch, solver, eta):
    """Reference draws once per step but ONLY when eta is truthy
    (sample.py:505-512); eta=0 is fully deterministic.  Covers both
    solver types."""
    cfg = {"SAMPLER_OPTIONS": {"ETA": eta, "SOLVER": solver}}
    table = _noise_table(NSTEPS - 1, seed=29)
    x_ref, calls = _run_ref_sde(monkeypatch, "DPMPP2MSDE", cfg, table)
    assert calls == (NSTEPS - 1 if eta else 0)

    from calodiffusion_tpu.samplers.dpm import DPMPP2MSDE

    x, _, _, s = _run_ours(
        DPMPP2MSDE, cfg, NSTEPS, _start(), noise_table=table
    )
    assert s.noise_draws == calls
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("eta", [0.0, 0.4])
def test_dpmpp3msde_trajectory_injected_noise(monkeypatch, eta):
    """Reference draws once per step with sigma_next != 0 regardless of
    eta (sample.py:565-571; the amplitude is 0 at eta=0 but the draw still
    advances the noise stream)."""
    cfg = {"SAMPLER_OPTIONS": {"ETA": eta}}
    table = _noise_table(NSTEPS - 1, seed=31)
    x_ref, calls = _run_ref_sde(monkeypatch, "DPMPP3MSDE", cfg, table)
    assert calls == NSTEPS - 1

    from calodiffusion_tpu.samplers.dpm import DPMPP3MSDE

    x, _, _, s = _run_ours(
        DPMPP3MSDE, cfg, NSTEPS, _start(), noise_table=table
    )
    assert s.noise_draws == calls
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_generate_cross_framework_ddim():
    """The composition proof: reference DDim sampling on the actual torch
    model vs ours on the transferred weights, same start -> same showers.
    (Per-component parity: denoise() in test_torch_parity_matrix.py, sampler
    stepping above; this seals the product.)"""
    from tests.test_torch_parity_matrix import _build_pair
    from tests.utils_test import tiny_ds2_config

    sample = _load_ref("calodiffusion.models.sample")
    cfg = tiny_ds2_config()
    ref, mine, params = _build_pair(cfg, seed=0)

    batch, steps = 4, 8
    rng = np.random.default_rng(42)
    shape = [batch] + list(cfg["SHAPE_PAD"][1:])
    start = rng.standard_normal(shape).astype(np.float32)
    E = rng.uniform(0.1, 1.0, (batch, 1)).astype(np.float32)
    layers = rng.standard_normal(
        (batch, cfg["SHAPE_FINAL"][2] + 1)
    ).astype(np.float32)

    with torch.no_grad():
        x_ref, xs_ref, _ = sample.DDim(dict(cfg))(
            ref, torch.from_numpy(start.copy()), torch.from_numpy(E),
            torch.from_numpy(layers), steps, 0, debug=True,
        )

    from calodiffusion_tpu.samplers.ddpm import DDim

    s = DDim(dict(cfg))
    x, xs, _ = s(
        mine, params, jnp.asarray(start), energy=jnp.asarray(E),
        layers=jnp.asarray(layers), num_steps=steps, sample_offset=0,
        key=jax.random.PRNGKey(0), debug=True,
    )
    x = np.asarray(x)
    # network-level tolerance: each denoise carries ~1e-4 relative error
    # through 8 steps
    scale = np.abs(x_ref.numpy()).max()
    np.testing.assert_allclose(
        x, x_ref.numpy(), atol=5e-3 * scale, rtol=5e-3,
        err_msg="cross-framework DDim generation diverged",
    )

    # distribution-level: our histogram suite sees the two frameworks'
    # outputs as indistinguishable (separation ~ 0)
    from calodiffusion_tpu.evaluation.metrics_utils import separation_power

    a = np.asarray(x).reshape(batch, -1).sum(axis=1)
    b = x_ref.numpy().reshape(batch, -1).sum(axis=1)
    bins = np.linspace(
        min(a.min(), b.min()) - 1e-6, max(a.max(), b.max()) + 1e-6, 8
    )
    ha, _ = np.histogram(a, bins=bins, density=True)
    hb, _ = np.histogram(b, bins=bins, density=True)
    assert separation_power(ha, hb, bins) < 1e-6


@pytest.mark.slow
def test_generate_cross_framework_dpmpp2m():
    """Same composition proof for the few-step production sampler
    (scripts/tpu_fewstep_check.py recipe): reference DPMPP2M
    (models/sample.py:415-449) on the actual torch model vs ours on the
    transferred weights, same start, 8 steps -> same showers.  Multistep
    history handling on the real network is exactly what the synthetic
    trajectory test above cannot cover.

    Patched-to-intent: the reference's class-form DPM samplers pass
    sigma as shape (B,) (``s_in``, sample.py:426 — copied from
    k-diffusion, whose denoiser wrapper broadcasts internally), but
    CaloDiffusion.denoise applies the loss scalings with sigma's own
    shape (calodiffusion.py:158-159, loss.py:29-41), so ``x * c_in``
    crashes on any 5D shower model.  DDim shows the intended convention
    — sigma broadcast to (B,1,1,1,1) via sampling.extract
    (sample.py:75-88) — so we wrap the torch model to reshape sigma
    before the call (PARITY.md quirks register)."""
    from tests.test_torch_parity_matrix import _build_pair
    from tests.utils_test import tiny_ds2_config

    sample = _load_ref("calodiffusion.models.sample")
    cfg = tiny_ds2_config()
    ref, mine, params = _build_pair(cfg, seed=0)

    batch, steps = 4, 8
    rng = np.random.default_rng(7)
    shape = [batch] + list(cfg["SHAPE_PAD"][1:])
    start = rng.standard_normal(shape).astype(np.float32)
    E = rng.uniform(0.1, 1.0, (batch, 1)).astype(np.float32)
    layers = rng.standard_normal(
        (batch, cfg["SHAPE_FINAL"][2] + 1)
    ).astype(np.float32)

    class SigmaShapedRef:
        """Reference model with the (B,)->(B,1,..,1) sigma broadcast the
        class-form DPM samplers need (see docstring)."""

        def __init__(self, m):
            self._m = m

        def __getattr__(self, name):  # nsteps, loss_function for DPM.setup
            return getattr(self._m, name)

        def __call__(self, x, sigma=None, E=None, layers=None):
            sigma = sigma.reshape(-1, *([1] * (x.dim() - 1)))
            return self._m(x, sigma=sigma, E=E, layers=layers)

    with torch.no_grad():
        x_ref, _, _ = sample.DPMPP2M(dict(cfg))(
            SigmaShapedRef(ref), torch.from_numpy(start.copy()),
            torch.from_numpy(E), torch.from_numpy(layers), steps, 0,
            debug=True,
        )

    from calodiffusion_tpu.samplers.dpm import DPMPP2M

    s = DPMPP2M(dict(cfg))
    x, _, _ = s(
        mine, params, jnp.asarray(start), energy=jnp.asarray(E),
        layers=jnp.asarray(layers), num_steps=steps, sample_offset=0,
        key=jax.random.PRNGKey(0), debug=True,
    )
    x = np.asarray(x)
    # multistep solver: per-denoise ~1e-4 relative error compounds through
    # the 2M history terms; same budget as the DDim proof
    scale = np.abs(x_ref.numpy()).max()
    np.testing.assert_allclose(
        x, x_ref.numpy(), atol=5e-3 * scale, rtol=5e-3,
        err_msg="cross-framework DPMPP2M generation diverged",
    )


# ---------------------------------------------------------------------------
# BespokeNonStationary (reference :1013-1122): affine per-step solver with a
# loaded theta table; per-step sigma is a fresh standard normal
# (reference model_fn :1108-1110)
# ---------------------------------------------------------------------------


def test_bespoke_trajectory_injected_sigma(tmp_path, monkeypatch):
    """With the same theta table and the same injected per-step sigmas the
    whole trajectory must match step-for-step (the solve step is
    x <- a_i x + b_i * denoise(x, sigma_i), reference :1050-1060)."""
    sample = _load_ref("calodiffusion.models.sample")
    start = _start(5)
    steps = 9
    rng = np.random.default_rng(41)
    theta = rng.normal(0.5, 0.2, size=(2, steps)).astype(np.float32)
    # sigma draws are (B,)-shaped (reference :1110: torch.randn(x.shape[0]))
    sigma_table = rng.standard_normal((steps, SHAPE[0])).astype(np.float32)

    pth = tmp_path / "bns_sampler.pth"
    with open(pth, "wb") as f:
        torch.save(torch.from_numpy(theta.copy()), f)
    _, randn, cursor = _make_torch_randn(sigma_table)
    monkeypatch.setattr(torch, "randn", randn)

    ref_model = _FakeTorchModel(NSTEPS)
    with torch.no_grad():
        class _Flags:  # .get's default arg evaluates flags eagerly (:1044)
            data_folder = str(tmp_path)

        x_ref, xs_ref, _, u_ref = sample.BespokeNonStationary(
            {"SAMPLER_OPTIONS": {"SAMPLER_PATH": str(pth)},
             "flags": _Flags()}
        )(
            ref_model, torch.from_numpy(start.copy()), None, None,
            steps, 0, debug=True,
        )
    assert cursor[0] == steps

    npy = tmp_path / "bns_sampler.npy"
    np.save(npy, theta)

    from calodiffusion_tpu.samplers.misc import BespokeNonStationary

    x, xs, _, s = _run_ours(
        BespokeNonStationary, {"SAMPLER_OPTIONS": {"SAMPLER_PATH": str(npy)}},
        steps, start, noise_table=sigma_table,
    )
    assert s.noise_draws == steps
    assert xs.shape[0] == len(xs_ref)
    for t in range(steps):
        np.testing.assert_allclose(
            xs[t], xs_ref[t].numpy(), rtol=5e-4, atol=5e-4,
            err_msg=f"BespokeNonStationary diverges at step {t}",
        )
    np.testing.assert_allclose(x, x_ref.numpy(), rtol=5e-4, atol=5e-4)
