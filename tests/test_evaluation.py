"""Evaluation-stack tests: XML binning, HLF, separation power, FPD,
classifier AUC/JSD."""

import numpy as np
import pytest

from calodiffusion_tpu.evaluation import frechet
from calodiffusion_tpu.evaluation.classifier import classifier_metrics
from calodiffusion_tpu.evaluation.hlf import HighLevelFeatures
from calodiffusion_tpu.evaluation.metrics_utils import separation_power
from calodiffusion_tpu.utils.xml_handler import XMLHandler

BINNING_XML = """<Bins>
<Particle name="photon">
  <Bin id="0" r_edges="0,5,10,30" n_bin_alpha="1"/>
  <Bin id="1" r_edges="0,2,5,10,20,30" n_bin_alpha="10"/>
  <Bin id="2" r_edges="0,10,30" n_bin_alpha="10"/>
  <Bin id="3" r_edges="0" n_bin_alpha="1"/>
</Particle>
</Bins>
"""


@pytest.fixture(scope="module")
def binning_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("xml") / "binning.xml"
    p.write_text(BINNING_XML)
    return str(p)


def test_xml_handler(binning_file):
    xml = XMLHandler("photon", binning_file)
    assert xml.GetTotalNumberOfBins() == 3 + 50 + 20
    assert xml.GetBinEdges() == [0, 3, 53, 73, 73]
    assert xml.GetRelevantLayers() == [0, 1, 2]
    assert xml.GetLayersWithBinningInAlpha() == [1, 2]
    eta, phi = xml.GetEtaPhiAllLayers()
    assert len(eta[1]) == 50
    # layer with single alpha bin: phi ~ r*sin(0) = 0? alpha center of 1 bin
    # spanning [-pi, pi] is 0 -> eta = r, phi = 0
    np.testing.assert_allclose(phi[0], 0, atol=1e-9)


def test_hlf_features(binning_file):
    hlf = HighLevelFeatures("photon", binning_file)
    rng = np.random.default_rng(0)
    data = rng.exponential(1.0, (50, 73)).astype(np.float32)
    hlf.CalculateFeatures(data)
    assert hlf.GetEtot().shape == (50,)
    assert set(hlf.GetElayers()) == {0, 1, 2}
    assert set(hlf.GetECEtas()) == {1, 2}
    np.testing.assert_allclose(
        hlf.GetEtot(),
        sum(hlf.GetElayers()[l] for l in hlf.GetElayers()),
        rtol=1e-5,
    )
    energies = rng.uniform(1, 100, (50, 1))
    feats = hlf.feature_matrix(energies)
    # 1 energy + 3 layer E + 2 layers x 4 moments
    assert feats.shape == (50, 1 + 3 + 8)
    assert np.all(np.isfinite(feats))


def test_separation_power_properties():
    bins = np.linspace(0, 1, 21)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, 20000)
    h1, _ = np.histogram(a, bins=bins, density=True)
    h2, _ = np.histogram(rng.uniform(0, 1, 20000), bins=bins, density=True)
    assert separation_power(h1, h1, bins) == 0
    assert separation_power(h1, h2, bins) < 0.01  # same dist, finite stats
    h3, _ = np.histogram(rng.normal(0.8, 0.05, 20000).clip(0, 1),
                         bins=bins, density=True)
    assert separation_power(h1, h3, bins) > 0.3  # very different dists


def test_fpd_discriminates():
    rng = np.random.default_rng(0)
    real = rng.normal(0, 1, (4000, 10))
    same = rng.normal(0, 1, (4000, 10))
    shifted = rng.normal(0.5, 1, (4000, 10))
    fpd_same, err_same = frechet.fpd(real, same, min_samples=200,
                                     max_samples=4000, num_batches=5)
    fpd_diff, _ = frechet.fpd(real, shifted, min_samples=200,
                              max_samples=4000, num_batches=5)
    assert fpd_diff > fpd_same + 0.1
    assert abs(fpd_same) < 0.1


def test_classifier_metrics_sanity():
    rng = np.random.default_rng(0)
    real = rng.normal(0, 1, (2000, 8)).astype(np.float32)
    # identical distributions -> AUC ~ 0.5, JSD ~ 0
    same = rng.normal(0, 1, (2000, 8)).astype(np.float32)
    m_same = classifier_metrics(real, same, epochs=5)
    assert 0.4 < m_same["auc"] < 0.6
    assert m_same["jsd"] < 0.12
    # clearly different -> high AUC, larger JSD
    diff = rng.normal(1.5, 1, (2000, 8)).astype(np.float32)
    m_diff = classifier_metrics(real, diff, epochs=5)
    assert m_diff["auc"] > 0.85
    assert m_diff["jsd"] > 0.3


def test_fidelity_metrics_gate():
    """The combined classifier+FPD gate used by the TPU fidelity scripts
    (scripts/tpu_fidelity_check.py / tpu_fidelity_families.py) and surfaced
    by bench.py: indistinguishable showers score AUC ~ 0.5 / FPD ~ 0;
    distorted showers are flagged."""
    from calodiffusion_tpu.evaluation.evaluate import (
        fidelity_metrics,
        shower_feature_matrix,
    )

    rng = np.random.default_rng(3)
    n, nlayers, cells = 1500, 10, 24

    def make(scale_depth=1.0, seed=0):
        r = np.random.default_rng(seed)
        e = r.uniform(1.0, 10.0, n)
        depth = np.arange(nlayers)[None, :, None]
        prof = np.exp(-0.5 * ((depth - 4.0 * scale_depth) / 2.0) ** 2)
        s = prof * r.gamma(2.0, 1.0, (n, nlayers, cells))
        s *= 0.5 * e[:, None, None] / s.sum(axis=(1, 2), keepdims=True)
        s[r.uniform(size=s.shape) < 0.3] = 0
        return s.reshape(n, -1).astype(np.float32), e.astype(np.float32)

    real, real_e = make(seed=1)
    same, same_e = make(seed=2)
    shifted, shifted_e = make(scale_depth=1.5, seed=3)

    feats = shower_feature_matrix(real, real_e, nlayers)
    assert feats.shape == (n, 6 + nlayers)
    assert np.isfinite(feats).all()

    m_same = fidelity_metrics(real, real_e, same, same_e, nlayers=nlayers,
                              epochs=5)
    assert 0.4 < m_same["classifier_auc"] < 0.62
    assert m_same["fpd"] < 0.5
    m_diff = fidelity_metrics(real, real_e, shifted, shifted_e,
                              nlayers=nlayers, epochs=5)
    assert m_diff["classifier_auc"] > 0.8
    assert m_diff["fpd"] > m_same["fpd"] + 0.5


def test_fpd_not_dominated_by_empty_layer():
    """An essentially-empty calorimeter layer (a handful of
    threshold-level hits, ~1e-7 of the shower) must not dominate FPD.
    The per-layer feature is log10(E_layer + 1e-8), the transform the
    reference feeds jetnet's FPD (reference train/evaluate.py:45-46);
    with raw layer *fractions* standardized by the reference-sample
    sigma, a 2x difference in the rate of such noise hits alone blew the
    distance past 20 (observed on the cascade family, round 3)."""
    from calodiffusion_tpu.evaluation.evaluate import fidelity_metrics

    n, nlayers, cells = 2000, 8, 16

    def make(noise_rate, seed):
        r = np.random.default_rng(seed)
        e = r.uniform(1.0, 10.0, n)
        s = r.gamma(2.0, 1.0, (n, nlayers, cells))
        s *= 0.5 * e[:, None, None] / s.sum(axis=(1, 2), keepdims=True)
        # last layer: empty except rare threshold-level hits
        s[:, -1, :] = 0.0
        hits = r.uniform(size=(n, cells)) < noise_rate
        s[:, -1, :] += hits * r.uniform(1e-7, 3e-7, (n, cells))
        return s.reshape(n, -1).astype(np.float32), e.astype(np.float32)

    real, real_e = make(noise_rate=0.002, seed=1)
    gen, gen_e = make(noise_rate=0.004, seed=2)  # 2x the tail noise
    m = fidelity_metrics(real, real_e, gen, gen_e, nlayers=nlayers,
                         epochs=5)
    assert m["fpd"] < 1.0, m


def test_conditional_per_feature_auc_null_when_bins_too_small():
    """When no conditioning bin has enough events on both sides, the
    conditional AUC is undefined and must return the NULL value 0.5 —
    an all-zeros vector would rank every feature as maximally deviant
    (|auc - 0.5| = 0.5) in the attribution diagnostic."""
    from calodiffusion_tpu.evaluation.evaluate import per_feature_auc

    r = np.random.default_rng(0)
    f_ref, f_gen = r.normal(size=(20, 3)), r.normal(size=(20, 3))
    out = per_feature_auc(f_ref, f_gen,
                          cond_ref=r.normal(size=20),
                          cond_gen=r.normal(size=20), n_bins=10)
    np.testing.assert_array_equal(out, 0.5)
