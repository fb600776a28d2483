"""FPD cross-validation against the published jetnet metric.

The reference computes FPD through ``jetnet.evaluation.fpd`` (reference
train/evaluate.py:70-79).  jetnet is not installable on the TPU host, so
``evaluation/frechet.py`` implements the algorithm directly; these tests
anchor it (VERDICT r3 Missing #2):

- ``fpd_jetnet`` replicates jetnet's exact defaults (max-|value|
  normalization, with-replacement subsets under ``np.random.seed``,
  per-size means, deg-1 polyfit).  A golden value on fixed random feature
  sets pins the algorithm offline.
- When the real jetnet package IS importable (CI installs it; see
  .github/workflows/test.yml "fpd-jetnet" step), the same inputs go
  through both implementations and must agree within the joint error bar.
"""

import numpy as np
import pytest

from calodiffusion_tpu.evaluation.frechet import (
    fpd,
    fpd_jetnet,
    frechet_gaussian_distance,
    normalise_features,
)

# Pinned from a verified run (numpy legacy RandomState streams are
# version-stable, so these reproduce bit-for-bit across hosts up to
# BLAS-level rounding in cov/sqrtm — hence the loose-ish rtol).
GOLDEN_VALUE = 0.0016678657932133276
GOLDEN_ERR = 4.432912211654144e-05


def _features(n=25000, d=31, kind="shifted"):
    """Fixed feature sets mimicking the HLF layout (~31 dims)."""
    rng = np.random.default_rng(2026)
    mean = rng.normal(0, 1, d)
    A = rng.normal(0, 0.3, (d, d))
    chol = np.eye(d) + 0.1 * A
    real = mean + rng.standard_normal((n, d)) @ chol.T
    if kind == "shifted":  # mild shift + scale, the golden case
        gen = (mean + 0.02) + (rng.standard_normal((n, d)) @ chol.T) * 1.01
    elif kind == "same":
        gen = mean + rng.standard_normal((n, d)) @ chol.T
    elif kind == "far":
        gen = (mean + 0.5) + (rng.standard_normal((n, d)) @ chol.T) * 1.3
    else:
        raise ValueError(kind)
    return real, gen


def test_fpd_jetnet_golden_value():
    real, gen = _features()
    v, e = fpd_jetnet(real, gen)
    np.testing.assert_allclose(v, GOLDEN_VALUE, rtol=1e-4)
    np.testing.assert_allclose(e, GOLDEN_ERR, rtol=1e-2)


def test_fpd_jetnet_orders_distribution_distance():
    real, gen_far = _features(n=21000, kind="far")
    _, gen_near = _features(n=21000, kind="shifted")
    v_far, _ = fpd_jetnet(real, gen_far, min_samples=10000,
                          max_samples=21000)
    v_near, _ = fpd_jetnet(real, gen_near, min_samples=10000,
                           max_samples=21000)
    assert v_far > 10 * v_near > 0


def test_normalise_features_matches_jetnet_semantics():
    x = np.array([[1.0, -4.0], [3.0, 2.0]])
    y = np.array([[6.0, 1.0]])
    xn, yn = normalise_features(x, y)
    # scaled by max |x| per feature (real sample sets the scale)
    np.testing.assert_allclose(xn, [[1 / 3, -1.0], [1.0, 0.5]])
    np.testing.assert_allclose(yn, [[2.0, 0.25]])
    # zero-max features must not divide by zero
    xz = np.zeros((4, 2))
    assert np.isfinite(normalise_features(xz)).all()


def test_fgd_singular_covariance_fallback():
    """Rank-deficient covariances go through the eps-offset fallback
    without NaNs (the standard FID regularization)."""
    rng = np.random.default_rng(0)
    base = rng.standard_normal((200, 1))
    x = np.concatenate([base, 2 * base, -base], axis=1)  # rank-1
    y = np.concatenate([base + 0.1, 2 * base, -base], axis=1)
    v = frechet_gaussian_distance(x, y)
    assert np.isfinite(v) and v >= 0


def test_harness_fpd_agrees_directionally_with_jetnet_algorithm():
    """The scaled-down harness fpd() (used by the family gates at ~1.5k
    events) must rank distribution distances the same way as the
    published algorithm."""
    real, gen_far = _features(n=2000, kind="far")
    _, gen_near = _features(n=2000, kind="same")
    v_far, _ = fpd(real, gen_far)
    v_near, _ = fpd(real, gen_near)
    j_far, _ = fpd_jetnet(real, gen_far, min_samples=500, max_samples=2000)
    j_near, _ = fpd_jetnet(real, gen_near, min_samples=500,
                           max_samples=2000)
    assert v_far > v_near
    assert j_far > j_near
    assert v_far > 10 * max(v_near, 1e-6)


def test_against_installed_jetnet_package():
    """CI-only (jetnet not installable on the TPU host): the same fixed
    inputs through jetnet.evaluation.fpd and our replica must agree
    within the joint fit error."""
    jetnet = pytest.importorskip("jetnet")
    real, gen = _features()
    ours, our_err = fpd_jetnet(real, gen)
    theirs, their_err = jetnet.evaluation.fpd(real, gen)
    assert abs(ours - float(theirs)) <= max(
        3.0 * (our_err + float(their_err)), 1e-3
    ), (ours, theirs)
