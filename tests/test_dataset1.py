"""Dataset-1 path: irregular geometry, GeomConverter, in-model NN embedding
(SHOWER_EMBED='orig-NN'), using a synthetic binning XML."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calodiffusion_tpu.models.diffusion import CaloDiffusion
from calodiffusion_tpu.utils.geom import GeomConverter
from calodiffusion_tpu.utils.preprocessing import preprocess_shower, reverse_norm
from calodiffusion_tpu.utils.xml_handler import XMLHandler
from tests.utils_test import tiny_ds2_config

# mini photon-like binning: 4 layers, union R grid -> regular (4, 10, R)
BINNING_XML = """<Bins>
<Particle name="photon">
  <Bin id="0" r_edges="0,5,10,30,50" n_bin_alpha="1"/>
  <Bin id="1" r_edges="0,2,5,10,20,30,50" n_bin_alpha="10"/>
  <Bin id="2" r_edges="0,10,30,50" n_bin_alpha="10"/>
  <Bin id="3" r_edges="0,20,50" n_bin_alpha="1"/>
</Particle>
</Bins>
"""


@pytest.fixture(scope="module")
def binning_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("xml") / "binning_ds1.xml"
    p.write_text(BINNING_XML)
    return str(p)


def test_geom_converter_roundtrip(binning_file):
    bins = XMLHandler("photon", binning_file)
    g = GeomConverter(bins)
    total_bins = bins.GetTotalNumberOfBins()
    rng = np.random.default_rng(0)
    flat = rng.exponential(1.0, (12, total_bins)).astype(np.float32)

    regular = g.convert(g.reshape(flat))
    assert regular.shape == (12, 4, 10, g.dim_r_out)
    # area-weighted splitting conserves energy exactly
    np.testing.assert_allclose(
        regular.sum(axis=(1, 2, 3)), flat.sum(axis=1), rtol=1e-4
    )
    back = g.unreshape(g.unconvert(regular))
    np.testing.assert_allclose(back, flat, atol=1e-3, rtol=1e-3)


def test_ds1_preprocess_roundtrip(binning_file):
    rng = np.random.default_rng(1)
    bins = XMLHandler("photon", binning_file)
    total_bins = bins.GetTotalNumberOfBins()
    shower = rng.exponential(0.001, (16, total_bins)).astype(np.float32)
    raw_e = rng.uniform(0.3, 4.0, (16, 1)).astype(np.float32)
    emin, emax = 0.256, 4194.304
    e_norm = np.log10(raw_e / emin) / np.log10(emax / emin)

    pre, layerE = preprocess_shower(
        shower.copy(), raw_e, None, binning_file, "layer-logit-norm",
        dataset_num=1, orig_shape=False, max_deposit=3.1,
    )
    assert layerE.shape[1] == 5  # totalE + 4 layers
    g = GeomConverter(bins)
    rec, energy = reverse_norm(
        pre.reshape(16, 1, 4, 10, g.dim_r_out), e_norm.astype(np.float32),
        emax=emax, emin=emin, binning_file=binning_file, max_deposit=3.1,
        logE=True, layerE=layerE, showerMap="layer-logit-norm",
        dataset_num=1, orig_shape=False, ecut=0,
    )
    np.testing.assert_allclose(energy, raw_e, rtol=1e-4)
    # geometry pinv + renormalization: modest tolerance
    np.testing.assert_allclose(rec, shower, atol=5e-3, rtol=5e-2)


@pytest.mark.slow  # ~60s
def test_ds1_model_with_nn_embed(binning_file):
    """In-model trainable geometry embedding on flat showers."""
    bins = XMLHandler("photon", binning_file)
    total_bins = bins.GetTotalNumberOfBins()
    g = GeomConverter(bins)
    cfg = tiny_ds2_config(
        DATASET_NUM=1,
        BIN_FILE=binning_file,
        SHOWER_EMBED="orig-NN",
        SHAPE_ORIG=[-1, total_bins],
        SHAPE_PAD=[-1, 1, total_bins],
        SHAPE_FINAL=[-1, 1, 4, 10, g.dim_r_out],
        LAYER_SIZE_UNET=[8, 8, 8, 8],
        COND_SIZE_UNET=16,
        # R/Z images use the hardcoded per-dataset radial tables; the
        # synthetic 6-ring binning doesn't match the real ds1 geometry
        R_Z_INPUT=False,
        PHI_INPUT=True,
        EMAX=4194.304, EMIN=0.256, MAXDEP=3.1,
    )
    model = CaloDiffusion(cfg, n_steps=4)
    params = model.init(jax.random.PRNGKey(0))

    batch = 2
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, total_bins)).astype(np.float32))
    E = jnp.full((batch, 1), 0.5)
    layers = jnp.zeros((batch, 5))
    sigma = jnp.full((batch, 1), 1.0)
    out = model.denoise(params, x, E=E, sigma=sigma, layers=layers)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))

    # loss + grads flow through the converter params too
    def loss_fn(p):
        return model.compute_loss(p, jax.random.PRNGKey(1), x, E, layers=layers)

    g_tree = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(g_tree))
    assert np.isfinite(total) and total > 0

    # sampling in the flat original shape
    out = model.sample(params, jax.random.PRNGKey(2), E,
                       layers=layers, num_steps=4)
    assert out.shape == (batch, total_bins)


def test_embed_roundtrip_matches_converter(binning_file):
    """embed_roundtrip = dec(enc(x)) through the model's NN embed with the
    model's own params (the embedding-ceiling diagnostic of
    scripts/tpu_fidelity_families.py --roundtrip); identity for models
    without a geometry embed."""
    from calodiffusion_tpu.models.converters import NNConverter

    bins = XMLHandler("photon", binning_file)
    total_bins = bins.GetTotalNumberOfBins()
    g = GeomConverter(bins)
    cfg = tiny_ds2_config(
        DATASET_NUM=1, BIN_FILE=binning_file, SHOWER_EMBED="orig-NN",
        SHAPE_ORIG=[-1, total_bins],
        SHAPE_PAD=[-1, 1, total_bins],
        SHAPE_FINAL=[-1, 1, 4, 10, g.dim_r_out],
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        R_Z_INPUT=False, PHI_INPUT=True,
        EMAX=4194.304, EMIN=0.256, MAXDEP=3.1,
    )
    model = CaloDiffusion(cfg, n_steps=4)
    params = model.init(jax.random.PRNGKey(0))

    x = jnp.asarray(np.random.default_rng(3).exponential(
        0.1, (3, total_bins)).astype(np.float32))
    rt = model.embed_roundtrip(params, x)
    assert rt.shape == x.shape

    conv = NNConverter(g, dtype=jnp.float32)
    sub = {"params": params["params"]["NN_embed"]}
    y = conv.apply(sub, x, method="enc")
    expected = conv.apply(sub, y, method="dec")
    np.testing.assert_allclose(np.asarray(rt), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)
    # the pinv-initialized converter is a near-exact roundtrip on showers
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x),
                               atol=5e-3, rtol=5e-2)

    # no-embed model: identity
    cfg2 = tiny_ds2_config(LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16)
    model2 = CaloDiffusion(cfg2, n_steps=4)
    params2 = model2.init(jax.random.PRNGKey(0))
    x2 = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 1, 45, 16, 9)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(model2.embed_roundtrip(params2, x2)), np.asarray(x2)
    )
