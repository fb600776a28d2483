"""HGCal in-model GLaM embedding path (SHOWER_EMBED='NN', no pre-embed):
encode/decode runs inside the jitted forward, optionally trainable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calodiffusion_tpu.models.diffusion import CaloDiffusion
from calodiffusion_tpu.utils import hgcal_utils
from tests.utils_test import tiny_ds2_config


@pytest.fixture(scope="module")
def geom_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("geom") / "synth_geom.pkl"
    geom = hgcal_utils.make_synthetic_geom(nlayers=4, cells_per_ring=6,
                                           nrings=5)
    hgcal_utils.save_geom(geom, str(path))
    return str(path)


@pytest.mark.parametrize("trainable", [False, True])
def test_hgcal_inmodel_embed(geom_file, trainable):
    geom = hgcal_utils.load_geom(geom_file)
    C = geom.max_ncell
    cfg = tiny_ds2_config(
        HGCAL=True,
        DATASET_NUM=121,
        BIN_FILE=geom_file,
        SHOWER_EMBED="NN",
        TRAINABLE_EMBED=trainable,
        SHAPE_ORIG=[-1, 4, C],
        SHAPE_PAD=[-1, 4, C],
        SHAPE_FINAL=[-1, 1, 4, 8, 6],
        LAYER_SIZE_UNET=[8, 8, 8, 8],
        COND_SIZE_UNET=16,
        R_Z_INPUT=True,
        PHI_INPUT=True,
        EMAX=[100, 2.01, 1.572],
        EMIN=[50, 1.99, 1.57],
        logE=False,
        MAXDEP=1.0,
    )
    model = CaloDiffusion(cfg, n_steps=4)
    params = model.init(jax.random.PRNGKey(0))

    has_embed_params = "NN_embed" in params["params"]
    assert has_embed_params == trainable

    batch = 2
    x = jnp.asarray(
        np.random.default_rng(0).exponential(0.1, (batch, 4, C)).astype(np.float32)
    )
    E = jnp.full((batch, 3), 0.5)   # HGCal: 3 gen-info conditions
    layers = jnp.zeros((batch, 5))
    sigma = jnp.full((batch, 1, 1), 1.0)
    out = model.denoise(params, x, E=E, sigma=sigma, layers=layers)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))

    def loss_fn(p):
        return model.compute_loss(p, jax.random.PRNGKey(1), x, E, layers=layers)

    grads = jax.grad(loss_fn)(params)
    if trainable:
        g_embed = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree_util.tree_leaves(grads["params"]["NN_embed"])
        )
        assert np.isfinite(g_embed) and g_embed > 0

    # embedding-ceiling diagnostic: enc->dec through the model's GLaM
    # params (works for both frozen and trainable converters)
    rt = model.embed_roundtrip(params, x)
    assert rt.shape == x.shape
    from calodiffusion_tpu.models.hgcal_converter import HGCalConverterModule

    conv = HGCalConverterModule(**model.net.hgcal_converter)
    sub = {"params": params["params"].get("NN_embed", {})}
    y = conv.apply(sub, x, method="enc")
    expected = conv.apply(sub, y, method="dec")
    np.testing.assert_allclose(np.asarray(rt), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)
