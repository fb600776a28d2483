"""W8A8 int8 sampling path (ops/quant.py) — CPU-forced via CALODIFF_INT8.

The reference has no counterpart (it samples in eager f32 torch,
calodiffusion/models/diffusion.py); the int8 path is a TPU-native
extension gated behind config QUANT_INT8, so these tests pin:
  - the quantization primitives (weight per-cout, activation per-tensor)
  - int8_conv3d against the float conv oracle at int8-resolution tolerance
  - calibration -> scales table -> sampling dispatch end-to-end
  - training/gradient paths never touch the int8 kernels
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calodiffusion_tpu.ops import quant
from calodiffusion_tpu.ops.conv import conv3d, cylindrical_conv3d
from tests.utils_test import tiny_ds2_config


@pytest.fixture()
def force_int8(monkeypatch):
    monkeypatch.setenv("CALODIFF_INT8", "force")


def test_weight_quant_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 8, 16))
    wq, sw = quant.quantize_weight_per_cout(w)
    assert wq.dtype == jnp.int8 and sw.shape == (16,)
    deq = wq.astype(jnp.float32) * sw
    # per-channel symmetric int8: error bounded by scale/2 per element
    err = np.max(np.abs(np.asarray(deq - w)), axis=(0, 1, 2, 3))
    assert np.all(err <= np.asarray(sw) * 0.5 + 1e-7)


def test_act_quant_saturates():
    x = jnp.array([-10.0, -1.0, 0.0, 0.5, 10.0])
    q = quant.quantize_act(x, scale=1.0 / 127.0)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), [-127, -127, 0, 64, 127])


@pytest.mark.parametrize("cylindrical", [False, True])
def test_int8_conv3d_matches_float_oracle(cylindrical):
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 5, 8, 6, 4))
    w = jax.random.normal(k2, (3, 3, 3, 4, 8)) * 0.1
    b = jax.random.normal(k3, (8,)) * 0.01
    sx = float(jnp.max(jnp.abs(x))) / 127.0

    ref_op = cylindrical_conv3d if cylindrical else conv3d
    y_ref = ref_op(x, w, b, stride=1, padding=1)
    y_q = quant.int8_conv3d(x, w, b, sx, stride=1, padding=1,
                            cylindrical=cylindrical)
    assert y_q.shape == y_ref.shape
    # int8 resolution: ~1% of dynamic range per operand, accumulated
    rel = np.max(np.abs(np.asarray(y_q - y_ref))) / (
        np.max(np.abs(np.asarray(y_ref))) + 1e-9
    )
    assert rel < 0.05, rel


@pytest.mark.parametrize("cylindrical", [False, True])
@pytest.mark.parametrize("stride,out_pad", [((1, 2, 2), 0), ((2, 2, 2), (0, 1, 1))])
def test_int8_conv3d_transpose_matches_float_oracle(cylindrical, stride,
                                                    out_pad):
    from calodiffusion_tpu.ops.conv import (
        conv3d_transpose, cylindrical_conv3d_transpose,
    )

    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 5, 8, 6, 4))
    w = jax.random.normal(k2, (3, 4, 4, 4, 8)) * 0.1
    b = jax.random.normal(k3, (8,)) * 0.01
    sx = float(jnp.max(jnp.abs(x))) / 127.0

    ref_op = cylindrical_conv3d_transpose if cylindrical else conv3d_transpose
    y_ref = ref_op(x, w, b, stride=stride, padding=1,
                   output_padding=out_pad)
    y_q = quant.int8_conv3d_transpose(
        x, w, b, sx, stride=stride, padding=1, output_padding=out_pad,
        cylindrical=cylindrical,
    )
    assert y_q.shape == y_ref.shape
    rel = np.max(np.abs(np.asarray(y_q - y_ref))) / (
        np.max(np.abs(np.asarray(y_ref))) + 1e-9
    )
    assert rel < 0.05, rel


def test_int8_transpose_optin_via_env(force_int8, monkeypatch):
    """CALODIFF_INT8_TRANSPOSE=1 routes the U-Net upsample convs through
    int8 (off by default: measured as a small loss on the v5e, see
    BASELINE.md dead-end table).  Sampling must stay close to float and
    the calibration table must grow the ConvTranspose entries."""
    monkeypatch.setenv("CALODIFF_INT8_TRANSPOSE", "1")
    model, params, E, layers = _tiny_model()
    out_f = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)

    model.config["QUANT_INT8"] = True
    table = model.prepare_int8(params, n_sigmas=4, batch=4)
    assert any("Transpose" in k for k in table), sorted(table)

    out_q = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)
    a, b = np.asarray(out_f), np.asarray(out_q)
    assert np.isfinite(b).all()
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert rel < 0.15, rel


def test_quant_int8_exclude_filters_scale_table(force_int8):
    """QUANT_INT8_EXCLUDE keeps matching convs in high precision: their
    paths are dropped from the calibrated scales table, so scale_for()
    returns None and the conv dispatches float (the per-conv fence from
    the cascade int8 ablation, scripts/tpu_int8_cascade_ablation.py)."""
    model, params, E, layers = _tiny_model()
    model.config["QUANT_INT8"] = True
    full = dict(model.prepare_int8(params, n_sigmas=2, batch=2))
    assert any("ResnetBlock_0" in p for p in full)

    model.config["QUANT_INT8_EXCLUDE"] = ["ResnetBlock_0/", "init_conv"]
    filt = model.prepare_int8(params, n_sigmas=2, batch=2)
    assert not any("ResnetBlock_0/" in p for p in filt)
    kept = set(full) - set(filt)
    assert kept and all("ResnetBlock_0/" in p or "init_conv" in p
                        for p in kept)
    # sampling with the filtered table still runs and stays close to float
    out_q = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)
    model.config["QUANT_INT8"] = False
    out_f = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)
    a, b = np.asarray(out_f), np.asarray(out_q)
    assert np.isfinite(b).all()
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert rel < 0.15, rel


def test_weight_only_w8a16_mode(force_int8):
    """A WEIGHT_ONLY sentinel in the scales table runs the conv with
    int8-dequantized weights and float activations — close to float at
    weight-grid resolution, and different from both float and full W8A8
    (the diagnostic that splits weight- from activation-quant error)."""
    model, params, E, layers = _tiny_model()
    model.config["QUANT_INT8"] = True
    full = dict(model.prepare_int8(params, n_sigmas=2, batch=2))

    model._int8_scales = {p: quant.WEIGHT_ONLY for p in full}
    out_w = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)
    model.config["QUANT_INT8"] = False
    out_f = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)
    a, b = np.asarray(out_f), np.asarray(out_w)
    assert np.isfinite(b).all()
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert 0 < rel < 0.05, rel  # weight grid is fine; must not be exact


def test_dequantized_weight_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 8, 16))
    dq = quant.dequantized_weight(w)
    err = np.max(np.abs(np.asarray(dq - w)))
    step = float(np.max(np.abs(np.asarray(w)), axis=(0, 1, 2, 3)).max()) / 127
    assert err <= step * 0.5 + 1e-7


def test_scales_from_stats_flattens_module_tree():
    stats = {
        "CondUnet_0": {
            "Conv3d_3": {"absmax": (jnp.asarray(12.7),)},
            "ResnetBlock_0": {"Conv3d_0": {"absmax": jnp.asarray(2.54)}},
        }
    }
    out = quant.scales_from_stats(stats)
    assert out == pytest.approx(
        {
            "CondUnet_0/Conv3d_3": 0.1,
            "CondUnet_0/ResnetBlock_0/Conv3d_0": 0.02,
        }
    )
    merged = quant.merge_stats(out, {"CondUnet_0/Conv3d_3": 0.2})
    assert merged["CondUnet_0/Conv3d_3"] == 0.2
    assert merged["CondUnet_0/ResnetBlock_0/Conv3d_0"] == pytest.approx(0.02)


def _tiny_model():
    from calodiffusion_tpu.models.diffusion import CaloDiffusion

    cfg = tiny_ds2_config()
    model = CaloDiffusion(cfg, n_steps=8, loss_type="l2")
    params = model.init(jax.random.PRNGKey(0))
    E = jax.random.uniform(jax.random.PRNGKey(1), (4, 1))
    layers = (
        jax.random.normal(jax.random.PRNGKey(2),
                          (4, cfg["SHAPE_FINAL"][2] + 1))
        if model.layer_cond else None
    )
    return model, params, E, layers


def test_int8_sampling_close_to_float(force_int8):
    model, params, E, layers = _tiny_model()
    out_f = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)

    model.config["QUANT_INT8"] = True
    table = model.prepare_int8(params, n_sigmas=4, batch=4)
    assert len(table) > 10  # every block conv calibrated
    assert all(s > 0 for s in table.values())

    out_q = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                         num_steps=8)
    a, b = np.asarray(out_f), np.asarray(out_q)
    assert np.isfinite(b).all()
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert rel < 0.15, rel  # PTQ noise, not divergence

    # jittable with pre-calibrated scales
    jf = jax.jit(
        lambda p, k: model.sample(p, k, E, layers=layers, num_steps=8)
    )
    out_j = np.asarray(jf(params, jax.random.PRNGKey(3)))
    rel_j = np.max(np.abs(out_j - a)) / (np.max(np.abs(a)) + 1e-9)
    assert np.isfinite(out_j).all() and rel_j < 0.15, rel_j


def test_int8_inside_jit_without_calibration_raises(force_int8):
    model, params, E, layers = _tiny_model()
    model.config["QUANT_INT8"] = True
    with pytest.raises(RuntimeError, match="prepare_int8"):
        jax.jit(
            lambda p, k: model.sample(p, k, E, layers=layers, num_steps=8)
        )(params, jax.random.PRNGKey(3))


def test_int8_off_is_bit_identical(force_int8):
    """Without QUANT_INT8 the quantize=True convs take the plain path."""
    model, params, E, layers = _tiny_model()
    out1 = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                        num_steps=8)
    model.config["QUANT_INT8"] = False
    out2 = model.sample(params, jax.random.PRNGKey(3), E, layers=layers,
                        num_steps=8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_training_loss_untouched_by_quant_config(force_int8):
    """compute_loss (training path) never dispatches int8, even with
    QUANT_INT8 set and calibrated scales on the instance."""
    model, params, E, layers = _tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(5), (4, *model._data_shape))
    noise = jax.random.normal(jax.random.PRNGKey(6), x.shape)
    key = jax.random.PRNGKey(7)

    loss_ref = model.compute_loss(params, key, x, E, noise=noise,
                                  layers=layers)

    model.config["QUANT_INT8"] = True
    model.prepare_int8(params, n_sigmas=2, batch=2)
    loss_q = model.compute_loss(params, key, x, E, noise=noise,
                                layers=layers)
    np.testing.assert_array_equal(np.asarray(loss_ref), np.asarray(loss_q))


def test_prepare_int8_real_conditioning(force_int8):
    """Calibration on the REAL conditioning distribution: passing concrete
    E/layers must drive the recorded activation ranges — synthetic N(0,1)
    conditioning understates them when the true conditioning is off-scale
    (the cascade int8 FPD blowup), so off-scale real conditioning must
    produce strictly larger scales for at least the conditioning-side
    convs, and generate() must calibrate lazily from the loader batch."""
    model, params, E, layers = _tiny_model()
    model.config["QUANT_INT8"] = True

    t_syn = dict(model.prepare_int8(params, n_sigmas=2, batch=4))
    # conditioning 500x outside the synthetic calibration range inflates
    # the post-cond-injection convs (Block_1 inputs) ~10x (measured);
    # synthetic calibration would clip these activations to ~1/10 range
    big_layers = layers * 500.0
    t_real = dict(model.prepare_int8(params, n_sigmas=2, batch=4,
                                     E=E, layers=big_layers))
    assert t_real.keys() == t_syn.keys()
    assert any(t_real[k] > t_syn[k] * 2 for k in t_syn), (t_syn, t_real)

    # rows fewer than the calibration batch are tiled, not crashed
    model.prepare_int8(params, n_sigmas=2, batch=4, E=E[:1],
                       layers=big_layers[:1])

    # generate() calibrates lazily from the loader's first real batch
    # (sane layer vectors here: 500x logit fractions overflow ReverseNorm)
    model._int8_scales = None
    loader = [(np.asarray(E), np.asarray(layers),
               np.zeros((4, 6480), np.float32))]
    gen, en = model.generate(params, jax.random.PRNGKey(0), loader,
                             sample_steps=2)
    assert model._int8_scales is not None
    assert np.isfinite(gen).all()


def test_int8_cascade_sampling(force_int8):
    """LayerDiffusion two-stage sampling under QUANT_INT8: stage-2 U-Net
    convs quantized, layer ResNet stage untouched, output close to float."""
    from calodiffusion_tpu.models.layerdiffusion import LayerDiffusion

    cfg = tiny_ds2_config(
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        LAYER_STEPS=4, NSTEPS=4,
    )
    model = LayerDiffusion(cfg, n_steps=4, loss_type="l2")
    params = model.init(jax.random.PRNGKey(0))
    E = jax.random.uniform(jax.random.PRNGKey(1), (4, 1))

    out_f = model.sample(params, jax.random.PRNGKey(3), E, num_steps=4,
                         return_layers=True)
    model.config["QUANT_INT8"] = True
    out_q = model.sample(params, jax.random.PRNGKey(3), E, num_steps=4,
                         return_layers=True)
    # stage 1 (layer energies) has no convs: bit-identical
    np.testing.assert_array_equal(
        np.asarray(out_f["layers"]), np.asarray(out_q["layers"])
    )
    a, b = np.asarray(out_f["x"]), np.asarray(out_q["x"])
    assert np.isfinite(b).all()
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert 0 < rel < 0.2, rel  # quantized (different) but close


def test_cli_sample_int8_flag(tmp_path, force_int8):
    """`calodif-inference sample --int8` end-to-end on the tiny CLI
    workspace: trains 1 epoch, samples with QUANT_INT8 via the flag."""
    import json

    import h5py
    from click.testing import CliRunner

    from calodiffusion_tpu.inference import inference
    from calodiffusion_tpu.training import train

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        showers = rng.exponential(1.0, (16, 6480)).astype(np.float32)
        with h5py.File(data / fname, "w") as f:
            f.create_dataset("showers", data=showers)
            f.create_dataset(
                "incident_energies",
                data=rng.uniform(1e3, 1e6, (16, 1)).astype(np.float32),
            )
    cfg = tiny_ds2_config(
        EVAL=["dataset_2_2.hdf5"], VAL_FILES=["dataset_2_2.hdf5"],
        BATCH=16, MAXEPOCH=1, NSTEPS=4,
        LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
        CHECKPOINT_NAME="int8_cli",
    )
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    runner = CliRunner()
    r = runner.invoke(
        train,
        ["-c", str(cfg_path), "-d", str(data),
         "--checkpoint", str(tmp_path / "ckpt"), "diffusion"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    model_loc = str(tmp_path / "ckpt" / "int8_cli_Diffusion" / "final.ckpt")
    gen_out = str(tmp_path / "gen_int8.h5")
    r = runner.invoke(
        inference,
        ["-c", str(cfg_path), "-d", str(data),
         "--checkpoint-folder", str(tmp_path / "ckpt"),
         "sample", "--sample-steps", "2", "--model-loc", model_loc,
         "-g", gen_out, "--int8", "diffusion"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    with h5py.File(gen_out, "r") as f:
        assert np.all(np.isfinite(f["showers"][:]))


def test_int8_disallowed_off_tpu_by_default(monkeypatch):
    monkeypatch.delenv("CALODIFF_INT8", raising=False)
    if jax.default_backend() != "tpu":
        assert not quant.int8_allowed()
    monkeypatch.setenv("CALODIFF_INT8", "0")
    assert not quant.int8_allowed()
    monkeypatch.setenv("CALODIFF_INT8", "force")
    assert quant.int8_allowed()


def test_path_matches_segment_boundaries():
    """QUANT_INT8_EXCLUDE patterns match full path-segment runs only:
    'CondUnet_0/Conv3d_1' must not also exclude Conv3d_10..19 on wider
    U-Nets (ADVICE r4)."""
    pm = quant.path_matches
    assert pm("CondUnet_0/Conv3d_1/kernel", "CondUnet_0/Conv3d_1")
    assert not pm("CondUnet_0/Conv3d_10/kernel", "CondUnet_0/Conv3d_1")
    assert not pm("CondUnet_0/Conv3d_12", "Conv3d_1")
    # trailing slash = any descendant, same as the historical patterns
    assert pm("CondUnet_0/ResnetBlock_0/Block_1/Conv3d_0", "ResnetBlock_0/")
    assert not pm("CondUnet_0/ResnetBlock_01/Block_1", "ResnetBlock_0/")
    # mid-path runs must be contiguous full segments
    assert pm("a/b/c/d", "b/c")
    assert not pm("a/b/x/c", "b/c")
    assert not pm("a/b", "")
