"""Golden torch-parity across EVERY architecture path (VERDICT round-1 #1).

Each variant builds the actual reference PyTorch model with random weights,
imports them via tools/torch_import.py, and requires denoise()+loss parity.
Covers the paths the base golden test (test_torch_parity.py, ds2 U-Net) does
not: COMPRESS_Z=False, PHI_INPUT, TIME_EMBED='sigma', ds3 shapes, no-layer
conditioning, dataset-1 'orig-NN' NNConverter embed, HGCal in-model GLaM
(frozen + trainable), the FCN/dense-ResNet model, ConvNeXt blocks, and the
sinusoidal time/cond MLP stems (CondUnet-level).

Reference paths cited per variant below.  Skipped when /root/reference or
torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = os.environ.get("CALODIF_REFERENCE_ROOT", "/root/reference")

_ref_available = os.path.exists(os.path.join(REFERENCE_ROOT, "calodiffusion"))
if not _ref_available and os.environ.get("CALODIF_REQUIRE_REFERENCE"):
    # CI gate: missing reference must fail, not skip green (VERDICT Weak #5).
    raise RuntimeError(
        f"CALODIF_REQUIRE_REFERENCE is set but no reference checkout at "
        f"{REFERENCE_ROOT} — parity matrix would silently skip"
    )
pytestmark = [
    pytest.mark.slow,  # ~4 min: builds 12 torch+flax model pairs
    pytest.mark.skipif(not _ref_available, reason="reference checkout not available"),
]

if os.environ.get("CALODIF_REQUIRE_REFERENCE"):
    import torch  # hard requirement under the CI gate
else:
    torch = pytest.importorskip("torch")

from tests.utils_test import tiny_ds2_config  # noqa: E402


def _load_reference_module(name):
    from bench_baselines.reference_torch import _stub_missing_modules

    _stub_missing_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module(name)


def _build_pair(cfg, seed=0):
    """(reference model, our model, transferred params) for one config."""
    import jax

    from calodiffusion_tpu.models.diffusion import CaloDiffusion
    from calodiffusion_tpu.tools.torch_import import torch_state_dict_to_params

    RefModel = _load_reference_module(
        "calodiffusion.models.calodiffusion"
    ).CaloDiffusion
    torch.manual_seed(seed)
    ref = RefModel(dict(cfg), n_steps=10, loss_type="l2")
    ref.eval()

    mine = CaloDiffusion(dict(cfg), n_steps=10, loss_type="l2")
    params = mine.init(jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_state_dict_to_params(sd, mine, params)
    return ref, mine, params


def _assert_denoise_and_loss_parity(ref, mine, params, x, E, layers,
                                    sigmas=(0.05, 0.7, 5.0),
                                    atol=2e-4, rtol=2e-3):
    import jax
    import jax.numpy as jnp

    bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
    t_layers = torch.tensor(layers) if layers is not None else None
    j_layers = jnp.asarray(layers) if layers is not None else None

    for sigma_val in sigmas:
        sigma = np.full(bshape, sigma_val, np.float32)
        with torch.no_grad():
            ref_out = ref.denoise(
                torch.tensor(x), E=torch.tensor(E),
                sigma=torch.tensor(sigma), layers=t_layers,
            ).numpy()
        my_out = np.asarray(mine.denoise(
            params, jnp.asarray(x), E=jnp.asarray(E),
            sigma=jnp.asarray(sigma), layers=j_layers,
        ))
        np.testing.assert_allclose(
            my_out, ref_out, atol=atol, rtol=rtol,
            err_msg=f"denoise mismatch at sigma={sigma_val}",
        )

    rng = np.random.default_rng(1)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    rnd_normal = rng.standard_normal((x.shape[0],)).astype(np.float32)
    with torch.no_grad():
        ref_loss = float(ref.compute_loss(
            data=torch.tensor(x), energy=torch.tensor(E),
            noise=torch.tensor(noise), layers=t_layers,
            rnd_normal=torch.tensor(rnd_normal),
        ))
    my_loss = float(mine.compute_loss(
        params, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(E),
        noise=jnp.asarray(noise), layers=j_layers,
        rnd_normal=jnp.asarray(rnd_normal),
    ))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=2e-3)


def _ds2_inputs(cfg, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    shape = [batch] + list(cfg["SHAPE_PAD"][1:])
    x = rng.standard_normal(shape).astype(np.float32)
    E = rng.uniform(0.1, 1.0, (batch, 1)).astype(np.float32)
    layers = None
    if "layer" in cfg["SHOWERMAP"]:
        layers = rng.standard_normal(
            (batch, cfg["SHAPE_FINAL"][2] + 1)
        ).astype(np.float32)
    return x, E, layers


# ---------------------------------------------------------------------------
# CondUnet config-variant matrix (reference calodiffusion.py:39-81)
# ---------------------------------------------------------------------------

UNET_VARIANTS = {
    # reference models.py:335-369: stride (1,2,2) Down/Upsample when
    # COMPRESS_Z is off - different transpose-conv geometry
    "compress_z_off": dict(COMPRESS_Z=False),
    # reference calodiffusion.py:56-57,121-142: 4th input channel
    "phi_input": dict(PHI_INPUT=True),
    # reference calodiffusion.py:144-152: sigma/sqrt(1+sigma^2) time scalar
    "time_embed_sigma": dict(TIME_EMBED="sigma"),
    # no layer conditioning: cond_size=1 MLP stem (calodiffusion.py:59)
    "no_layer_cond": dict(SHOWERMAP="logit-norm"),
    # dataset-3 geometry: 45x50x18, odd alpha/R halving chains
    "ds3_shape": dict(
        DATASET_NUM=3,
        SHAPE_ORIG=[-1, 40500],
        SHAPE_PAD=[-1, 1, 45, 50, 18],
        SHAPE_FINAL=[-1, 1, 45, 50, 18],
        BLOCK_ATTN=True, MID_ATTN=True,
    ),
    # dataset-2 with attention everywhere plus no compression
    "attn_no_compress": dict(
        BLOCK_ATTN=True, MID_ATTN=True, COMPRESS_Z=False
    ),
}


@pytest.mark.parametrize("name", sorted(UNET_VARIANTS))
def test_unet_variant_parity(name):
    cfg = tiny_ds2_config(
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16, PRECISION="f32",
        **UNET_VARIANTS[name],
    )
    ref, mine, params = _build_pair(cfg)
    x, E, layers = _ds2_inputs(cfg)
    _assert_denoise_and_loss_parity(ref, mine, params, x, E, layers)


# ---------------------------------------------------------------------------
# dataset-1 'orig-NN': in-model NNConverter embed (reference
# calodiffusion.py:105-111, utils.py:576-656)
# ---------------------------------------------------------------------------

# ragged layers whose R-edge union is the 31-point grid 0..30 -> the
# regular grid has 30 radial bins, which the reference's hardcoded ds1
# R-image binning demands at model construction (utils.py:72-137 raises
# otherwise, even with R_Z_INPUT off)
BINNING_XML = "".join([
    '<Bins>\n<Particle name="photon">\n',
    '  <Bin id="0" r_edges="',
    ",".join(str(i) for i in range(0, 31, 2)), '" n_bin_alpha="1"/>\n',
    '  <Bin id="1" r_edges="',
    ",".join(str(i) for i in range(0, 31)), '" n_bin_alpha="10"/>\n',
    '  <Bin id="2" r_edges="',
    ",".join(str(i) for i in range(0, 31, 3)), '" n_bin_alpha="10"/>\n',
    '  <Bin id="3" r_edges="',
    ",".join(str(i) for i in range(0, 31, 5)), '" n_bin_alpha="1"/>\n',
    "</Particle>\n</Bins>\n",
])


def test_ds1_orig_nn_embed_parity(tmp_path):
    xml = tmp_path / "binning_ds1.xml"
    xml.write_text(BINNING_XML)

    from calodiffusion_tpu.utils.xml_handler import XMLHandler

    bins = XMLHandler("photon", str(xml))
    total_bins = bins.GetTotalNumberOfBins()
    # union R grid of the synthetic binning
    from calodiffusion_tpu.utils.geom import GeomConverter

    r_out = GeomConverter(bins).dim_r_out

    cfg = tiny_ds2_config(
        DATASET_NUM=1,
        BIN_FILE=str(xml),
        PART_TYPE="photon",
        SHOWER_EMBED="orig-NN",
        SHAPE_ORIG=[-1, total_bins],
        SHAPE_PAD=[-1, 1, total_bins],
        SHAPE_FINAL=[-1, 1, 4, 10, r_out],
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        # ds1 R/Z images hardcode the real photon binning (30 R bins,
        # reference utils.py:72-103) which the synthetic XML can't satisfy
        R_Z_INPUT=False, PHI_INPUT=True,
        PRECISION="f32",
    )
    ref, mine, params = _build_pair(cfg)

    rng = np.random.default_rng(3)
    batch = 2
    x = rng.standard_normal((batch, total_bins)).astype(np.float32)
    E = rng.uniform(0.1, 1.0, (batch, 1)).astype(np.float32)
    layers = rng.standard_normal((batch, 5)).astype(np.float32)
    _assert_denoise_and_loss_parity(ref, mine, params, x, E, layers)


# ---------------------------------------------------------------------------
# HGCal in-model GLaM (reference HGCal_utils.py:295-353, 517-690)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hgcal_geom_file(tmp_path_factory):
    from calodiffusion_tpu.utils import hgcal_utils

    path = tmp_path_factory.mktemp("geom") / "synth_geom.pkl"
    geom = hgcal_utils.make_synthetic_geom(nlayers=4, cells_per_ring=6,
                                           nrings=5)
    hgcal_utils.save_geom(geom, str(path))
    return str(path)


@pytest.mark.parametrize("trainable", [False, True])
def test_hgcal_inmodel_glam_parity(hgcal_geom_file, trainable):
    from calodiffusion_tpu.utils import hgcal_utils

    geom = hgcal_utils.load_geom(hgcal_geom_file)
    C = geom.max_ncell
    cfg = tiny_ds2_config(
        HGCAL=True,
        DATASET_NUM=121,
        BIN_FILE=hgcal_geom_file,
        SHOWER_EMBED="NN",
        TRAINABLE_EMBED=trainable,
        SHAPE_ORIG=[-1, 4, C],
        SHAPE_PAD=[-1, 1, 4, C],      # reference SHAPE_PAD layout
        SHAPE_FINAL=[-1, 1, 4, 8, 6],
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        R_Z_INPUT=True, PHI_INPUT=True,
        EMAX=[100, 2.01, 1.572], EMIN=[50, 1.99, 1.57],
        logE=False, MAXDEP=1.0,
        PRECISION="f32",
    )
    ref, mine, params = _build_pair(cfg)
    if trainable:
        # the reference never init()s a trainable converter (latent bug:
        # zero matrices + zero masks, calodiffusion.py:113-117); populate
        # it so there are real weights to transfer
        ref.NN_embed.init(norm=False, dataset_num=121)
        from calodiffusion_tpu.tools.torch_import import (
            torch_state_dict_to_params,
        )

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = torch_state_dict_to_params(sd, mine, params)

    rng = np.random.default_rng(4)
    batch = 2
    x = rng.standard_normal((batch, 1, 4, C)).astype(np.float32)
    E = rng.uniform(0.1, 1.0, (batch, 3)).astype(np.float32)
    layers = rng.standard_normal((batch, 5)).astype(np.float32)
    _assert_denoise_and_loss_parity(ref, mine, params, x, E, layers)


# ---------------------------------------------------------------------------
# FCN / dense ResNet shower model (reference models.py:392-457,
# calodiffusion.py:43-49; also the layer-energy model architecture)
# ---------------------------------------------------------------------------

def test_fcn_dense_resnet_parity():
    cfg = tiny_ds2_config(
        # 'orig' keeps the data flat - the only shape the dense model
        # accepts (a pure 'FCN' embed would feed (B,1,45,16,9) into
        # Linear(SHAPE_ORIG[1]) in the reference: latent bug)
        SHOWER_EMBED="FCN-orig",
        SHOWERMAP="logit-norm",   # reference FCN breaks with layer cond
        NUM_LAYERS_LINEAR=3,
        COND_SIZE_UNET=16,
        SHAPE_ORIG=[-1, 64],
        PRECISION="f32",
    )
    ref, mine, params = _build_pair(cfg)
    rng = np.random.default_rng(5)
    batch = 4
    x = rng.standard_normal((batch, 64)).astype(np.float32)
    E = rng.uniform(0.1, 1.0, (batch, 1)).astype(np.float32)
    _assert_denoise_and_loss_parity(ref, mine, params, x, E, None)


# ---------------------------------------------------------------------------
# CondUnet-level parity: ConvNeXt blocks and sinusoidal time stem.  Neither
# is reachable through the reference CaloDiffusion config surface
# (use_convnext is never passed, calodiffusion.py:65-80; TIME_EMBED='sin'
# crashes reference do_time_embed :144-152), so compare the networks
# directly with identical inputs.
# ---------------------------------------------------------------------------

def _unet_pair(torch_kwargs, flax_kwargs, data_shape, use_convnext=False,
               time_embed=False, cond_embed=False, block_attn=False,
               mid_attn=False, cond_shape=(1,)):
    import jax
    import jax.numpy as jnp

    models = _load_reference_module("calodiffusion.models.models")
    torch.manual_seed(0)
    ref = models.CondUnet(**torch_kwargs)
    ref.eval()

    from calodiffusion_tpu.models.nn_modules import CondUnet
    from calodiffusion_tpu.tools.torch_import import import_condunet

    mine = CondUnet(**flax_kwargs)
    batch = 2
    x = np.random.default_rng(0).standard_normal(
        (batch, *data_shape, torch_kwargs["channels"])
    ).astype(np.float32)
    cond = np.random.default_rng(1).uniform(
        0.1, 1.0, (batch, *cond_shape)
    ).astype(np.float32)
    t = np.random.default_rng(2).uniform(0.1, 1.0, (batch,)).astype(np.float32)

    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       cond=jnp.asarray(cond), time=jnp.asarray(t))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    import flax

    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)

    def to_mutable(d):
        return {k: to_mutable(v) for k, v in d.items()} if isinstance(d, dict) else np.asarray(d)

    p = to_mutable(p)
    import_condunet(
        p, sd, ["params"],
        n_res=len(torch_kwargs["layer_sizes"]) - 1,
        block_attn=block_attn, mid_attn=mid_attn,
        time_embed=time_embed, cond_embed=cond_embed,
        use_convnext=use_convnext,
    )
    params = jax.tree_util.tree_map(jnp.asarray, p)

    x_torch = np.moveaxis(x, -1, 1)  # channels-first for torch
    with torch.no_grad():
        ref_out = ref(
            torch.tensor(x_torch), cond=torch.tensor(cond),
            time=torch.tensor(t),
        ).numpy()
    my_out = np.moveaxis(
        np.asarray(mine.apply(params, jnp.asarray(x), cond=jnp.asarray(cond),
                              time=jnp.asarray(t))), -1, 1,
    )
    np.testing.assert_allclose(my_out, ref_out, atol=3e-4, rtol=3e-3)


def test_convnext_unet_parity(monkeypatch):
    # The reference ConvNextBlock broadcasts the conditioning as
    # "b c -> b c 1 1" (models.py:240) - 2D-conv code inside a 3D network,
    # so every conditioned ConvNeXt forward crashes (latent bug; the block
    # is also unreachable from configs).  Patch to the intended 3D
    # broadcast to have something to compare against.
    models = _load_reference_module("calodiffusion.models.models")

    def fixed_forward(self, x, time_emb=None):
        h = self.ds_conv(x)
        if self.mlp is not None and time_emb is not None:
            c = self.mlp(time_emb)
            h = h + c.reshape(c.shape[0], c.shape[1], 1, 1, 1)
        h = self.net(h)
        return h + self.res_conv(x)

    monkeypatch.setattr(models.ConvNextBlock, "forward", fixed_forward)
    shape = (8, 8, 8)
    common = dict(
        layer_sizes=[8, 8, 8],
        cond_dim=16,
        use_convnext=True,
        cylindrical=True,
        compress_Z=True,
        time_embed=False,
        cond_embed=False,
        cond_size=1,
    )
    _unet_pair(
        dict(out_dim=1, channels=1, data_shape=(-1, 1, *shape), **common),
        dict(out_dim=1, channels=1, data_shape=shape, **common),
        shape, use_convnext=True,
    )


def test_sinusoidal_time_cond_stems_parity():
    """TIME_EMBED='sin' / COND_EMBED='sin' MLP stems
    (reference models.py:578-608)."""
    shape = (8, 8, 8)
    common = dict(
        layer_sizes=[8, 8, 8],
        cond_dim=16,
        cylindrical=True,
        compress_Z=True,
        time_embed=True,
        cond_embed=True,
        cond_size=1,
    )
    # the reference's sinusoidal cond stem only broadcasts for 1-D cond
    # vectors (models.py:137-144 time[:, None]); CaloDiffusion always
    # passes 2-D E so COND_EMBED='sin' is latent-broken there - compare at
    # the CondUnet level with the 1-D shape it can handle
    _unet_pair(
        dict(out_dim=1, channels=1, data_shape=(-1, 1, *shape), **common),
        dict(out_dim=1, channels=1, data_shape=shape, **common),
        shape, time_embed=True, cond_embed=True, cond_shape=(),
    )
