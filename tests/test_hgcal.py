"""HGCal GLaM tests on synthetic geometry (the real detector pickle ships in
an external submodule; the reference's own CI also mocks HGCal data)."""

import numpy as np
import pytest

from calodiffusion_tpu.utils import hgcal_utils


@pytest.fixture(scope="module")
def geom_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("geom") / "synth_geom.pkl"
    geom = hgcal_utils.make_synthetic_geom(nlayers=4, cells_per_ring=6,
                                           nrings=5)
    hgcal_utils.save_geom(geom, str(path))
    return str(path)


@pytest.fixture(scope="module")
def converter(geom_file):
    conv = hgcal_utils.HGCalConverter(bins=[-1, 1, 4, 8, 6],
                                      geom_file=geom_file)
    conv.init()
    return conv


def test_load_geom_roundtrip(geom_file):
    geom = hgcal_utils.load_geom(geom_file)
    assert geom.max_ncell == int(round(np.amax(geom.ncells)))
    assert geom.theta_map.shape == geom.xmap.shape
    assert np.all(geom.theta_map >= 0) and np.all(geom.theta_map < 2 * np.pi)


def test_init_map_conserves_energy(geom_file):
    """Every cell's encode weights sum to 1 -> encoding conserves energy."""
    geom = hgcal_utils.load_geom(geom_file)
    w, mask = hgcal_utils.init_map(8, 6, geom, 0)
    ncells = int(round(geom.ncells[0]))
    col_sums = w[:, :ncells].sum(axis=0)
    np.testing.assert_allclose(col_sums, 1.0, atol=1e-5)
    # mask covers at least the nonzero weights
    assert np.all(mask[w > 0] > 0)


def test_enc_conserves_energy(converter):
    rng = np.random.default_rng(0)
    geom = converter.geom
    x = rng.exponential(1.0, (10, 4, geom.max_ncell)).astype(np.float32)
    # zero out cells beyond each layer's real cell count
    for lay in range(4):
        x[:, lay, int(round(geom.ncells[lay])):] = 0
    emb = converter.enc(x)
    assert emb.shape == (10, 4, 8, 6)
    np.testing.assert_allclose(
        emb.sum(axis=(2, 3)), x.sum(axis=2), rtol=1e-4
    )


def test_enc_dec_roundtrip(converter):
    """pinv decode after encode is close to identity in the embed space."""
    rng = np.random.default_rng(1)
    geom = converter.geom
    x = rng.exponential(1.0, (6, 4, geom.max_ncell)).astype(np.float32)
    for lay in range(4):
        x[:, lay, int(round(geom.ncells[lay])):] = 0
    emb = converter.enc(x)
    dec = converter.dec(emb)
    emb2 = converter.enc(dec)
    # enc(dec(.)) is a projection: applying it twice is stable
    np.testing.assert_allclose(emb2, emb, atol=1e-3, rtol=1e-3)


def test_sparse_decoding_conserves_energy(converter):
    rng = np.random.default_rng(2)
    x = rng.exponential(1.0, (4, 4, 8, 6)).astype(np.float32)
    dense = converter.dec(x)
    sparse = converter.dec(x, sparse_decoding=True,
                           rng=np.random.default_rng(3))
    assert sparse.shape == dense.shape
    # stochastic cell selection conserves the decoded energy per layer
    np.testing.assert_allclose(
        sparse.sum(axis=-1), dense.sum(axis=-1), rtol=5e-3, atol=1e-4
    )
    # and is sparser (fewer nonzero cells)
    assert (np.abs(sparse) > 1e-8).sum() < (np.abs(dense) > 1e-8).sum()


def test_hgcal_preprocess_roundtrip(geom_file):
    """HGCal preprocess + reverse_norm roundtrip on raw (unembedded) cells."""
    rng = np.random.default_rng(3)
    n, L, C = 16, 4, 91
    shower = rng.exponential(0.01, (n, L, C)).astype(np.float32)
    gen_info = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    emin = [50, 1.99, 1.57]
    emax = [100, 2.01, 1.572]
    gen_raw = np.array(emin) + (np.array(emax) - np.array(emin)) * gen_info

    pre, layerE = hgcal_utils.preprocess_hgcal_shower(
        shower.copy(), gen_raw[:, 0], None, "layer-logit-norm",
        dataset_num=121, max_deposit=1.0,
    )
    rec, gen_out = hgcal_utils.reverse_norm_hgcal(
        pre.reshape(n, L, C), gen_info, emax=emax, emin=emin,
        layerE=layerE, showerMap="layer-logit-norm", dataset_num=121,
        max_deposit=1.0,
    )
    np.testing.assert_allclose(gen_out, gen_raw, rtol=1e-5)
    np.testing.assert_allclose(rec, shower, atol=2e-4, rtol=2e-3)


def test_hgcal_loader_and_reverse(geom_file, tmp_path):
    """Full HGCal pre-embed data path like the reference mocked-HGCal test."""
    import h5py

    rng = np.random.default_rng(4)
    n = 24
    geom = hgcal_utils.load_geom(geom_file)
    C = geom.max_ncell
    fname = tmp_path / "mock_hgcal.h5"
    with h5py.File(fname, "w") as f:
        f.create_dataset("gen_info",
                         data=rng.uniform(0.5, 1.0, (n, 3)).astype("<f4"))
        f.create_dataset("showers",
                         data=rng.random((n, 4, C)).astype("<f4"))

    config = {
        "SHAPE_FINAL": [-1, 1, 4, 8, 6],
        "BIN_FILE": geom_file,
        "TRAINABLE_EMBED": False,
        "DATASET_NUM": 121,
    }
    NN_embed = hgcal_utils.make_pre_embed_converter(config)
    showers, gen, layerE = hgcal_utils.load_hgcal_h5(
        str(fname), shape=[-1, 1, 4, 8, 6],
        emax=[100, 2.01, 1.572], emin=[50, 1.99, 1.57],
        showerMap="layer-logit-norm", dataset_num=121, max_deposit=1.0,
        shower_scale=1.0, embed=True, NN_embed=NN_embed, config=config,
        binning_file=geom_file,
    )
    assert showers.shape == (n, 4, 8, 6)
    assert gen.shape == (n, 3)
    assert layerE.shape == (n, 5)
    assert np.all(np.isfinite(showers))

    rec, gen_out = hgcal_utils.reverse_norm_hgcal(
        showers.reshape(-1, 1, 4, 8, 6), gen,
        emax=[100, 2.01, 1.572], emin=[50, 1.99, 1.57], layerE=layerE,
        showerMap="layer-logit-norm", dataset_num=121, max_deposit=1.0,
        embed=True, NN_embed=NN_embed, config=config,
    )
    assert rec.shape == (n, 4, C)
    assert np.all(np.isfinite(rec))
