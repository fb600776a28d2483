"""Post-training W8A8 int8 quantization for the sampling path.

The ds2 sampling roofline (BASELINE.md round 3) showed the bf16 convs run
at 125-130% of the lane-padded MXU ideal — the bf16 formulation is
exhausted.  The v5e MXU's s8 x s8 -> s32 mode has ~2x the bf16 peak, and
measured per-conv speedups on the shipped shapes are 1.06-2.2x (largest
on the 64->32 up-path and all ds3 full-res convs).  This module provides
the machinery to run the U-Net's convolutions in int8 **during sampling
only** (training and gradient paths are untouched):

  - weights: per-output-channel symmetric int8 (computed in-trace from
    the bf16 params; scan-invariant, so XLA hoists the quantization out
    of the 400-step sampling loop)
  - activations: per-tensor symmetric int8 with STATIC scales from a
    calibration pass (a handful of eager `denoise` calls across the
    sampler's sigma range with a mutable `quant_stats` collection
    recording per-conv abs-max).  Static scales keep the hot loop free
    of data-dependent reductions; the EDM-style c_in preconditioning
    already normalizes the U-Net input at every sigma, which is what
    makes one scale per conv workable across all 400 steps.

Opt-in: config ``QUANT_INT8: true`` (sampling entry `Diffusion.sample`),
kill-switch ``CALODIFF_INT8=0``; ``CALODIFF_INT8=force`` additionally
enables the int8 path off-TPU (CPU tests).  First/last convs
(`init_conv`/`final_conv`) stay high-precision (standard PTQ practice).

No reference counterpart: the reference samples in f32 eager torch
(calodiffusion/models/diffusion.py); this is a TPU-native extension.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

# quant_stats collection name used by Conv3d's calibration sow
STATS_COL = "quant_stats"

# [scales dict or None]: module-path -> float activation scale (absmax/127)
_SCALES = [None]
# calibration mode flag: Conv3d sows abs-max instead of quantizing
_CALIB = [False]


def int8_allowed() -> bool:
    env = os.environ.get("CALODIFF_INT8", "1")
    if env == "0":
        return False
    return env == "force" or jax.default_backend() == "tpu"


@contextlib.contextmanager
def quant_scales(scales):
    """Activate int8 conv dispatch with the given {path: scale} table for
    traces opened inside this context."""
    prev = _SCALES[0]
    _SCALES[0] = scales
    try:
        yield
    finally:
        _SCALES[0] = prev


@contextlib.contextmanager
def calibration():
    """Mark traces as calibration passes: quantizable Conv3d modules sow
    their input abs-max into the `quant_stats` collection."""
    prev = _CALIB[0]
    _CALIB[0] = True
    try:
        yield
    finally:
        _CALIB[0] = prev


def calibrating() -> bool:
    return _CALIB[0]


def scale_for(path: str):
    """Activation scale for a module path, or None when int8 is off."""
    s = _SCALES[0]
    if s is None:
        return None
    return s.get(path)


def path_matches(path: str, pattern: str) -> bool:
    """Segment-boundary containment for QUANT_INT8_EXCLUDE patterns.

    The pattern's "/"-separated segments must appear as a contiguous run
    of FULL segments in the module path — raw substring containment would
    make "CondUnet_0/Conv3d_1" also exclude Conv3d_10..Conv3d_19 on wider
    U-Nets (ADVICE r4).  A trailing "/" (e.g. "ResnetBlock_0/") matches
    any descendant, same as before."""
    psegs = [s for s in path.split("/") if s]
    msegs = [s for s in pattern.split("/") if s]
    if not msegs:
        return False
    return any(
        psegs[i:i + len(msegs)] == msegs
        for i in range(len(psegs) - len(msegs) + 1)
    )


def scales_from_stats(stats, margin: float = 1.0) -> dict:
    """Flatten a `quant_stats` variable collection into {path: scale}.

    The collection mirrors the module tree:
    {'CondUnet_0': {'Conv3d_3': {'absmax': (value,)}}} -> path
    'CondUnet_0/Conv3d_3' (matching `_module_path`), scale = absmax/127.
    """
    from collections.abc import Mapping

    out = {}

    def walk(node, prefix):
        if isinstance(node, Mapping):
            if "absmax" in node:
                v = node["absmax"]
                if isinstance(v, (tuple, list)):
                    a = max(float(jax.device_get(t)) for t in v) if v else 0.0
                else:
                    a = float(jax.device_get(v))
                out[prefix] = max(a * margin, 1e-8) / 127.0
            else:
                for k, sub in node.items():
                    walk(sub, f"{prefix}/{k}" if prefix else k)

    walk(stats, "")
    return out


def merge_stats(a: dict, b: dict) -> dict:
    """Elementwise max of two {path: scale} tables."""
    out = dict(a)
    for k, v in b.items():
        out[k] = max(out.get(k, 0.0), v)
    return out


# sentinel scale value: run the conv with int8-DEQUANTIZED weights but
# full-precision activations (W8A16) — an accuracy diagnostic separating
# weight- from activation-quantization error (models/nn_modules.Conv3d)
WEIGHT_ONLY = "w8a16"


def dequantized_weight(w):
    """Fake-quantize: weights through the per-cout int8 grid and back."""
    wq, sw = quantize_weight_per_cout(w)
    return wq.astype(jnp.float32) * sw


def quantize_weight_per_cout(w):
    """(k, k, k, cin, cout) float -> (int8 weights, f32 (cout,) scales)."""
    wf = w.astype(jnp.float32)
    a = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)))
    sw = jnp.maximum(a, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def quantize_act(x, scale: float):
    """Float activations -> int8 with a static per-tensor scale."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127
    ).astype(jnp.int8)


def int8_conv3d(x, w, b, sx: float, stride, padding, cylindrical: bool):
    """int8 counterpart of ops/conv.py conv3d / cylindrical_conv3d.

    x: float (B, Z, A, R, C); w: float kernel (kz, ka, kr, cin, cout);
    sx: static activation scale.  Returns float of x.dtype:
    dequant(s8 conv) = y_s32 * (sx * sw[cout]) + b.
    """
    from calodiffusion_tpu.ops.conv import DIMS, _triple, wrap_pad_phi

    out_dtype = x.dtype
    stride = _triple(stride)
    pz, pa, pr = _triple(padding)
    wq, sw = quantize_weight_per_cout(w)
    xq = quantize_act(x, sx)
    if cylindrical:
        xq = wrap_pad_phi(xq, pa)
        pads = [(pz, pz), (0, 0), (pr, pr)]
    else:
        pads = [(pz, pz), (pa, pa), (pr, pr)]
    y = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=stride,
        padding=pads,
        dimension_numbers=DIMS,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sw * sx)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_conv3d_transpose(x, w, b, sx: float, stride, padding,
                          output_padding, cylindrical: bool):
    """int8 counterpart of conv3d_transpose / cylindrical_conv3d_transpose.

    Reuses the subpixel phase decomposition (ops/conv.py) and substitutes
    its core stride-1 conv with the s8 x s8 -> s32 MXU one: the subpixel
    kernel stacks all stride-phase sub-kernels on the output-channel axis
    (e.g. 8 x Cout = 256 lanes — fully MXU-packed), and dequantization
    happens before the phase interleave so the per-output-channel weight
    scales stay aligned.  Falls back to float for stride-1 (the dilated
    path, unused by the shipped upsample shapes)."""
    from calodiffusion_tpu.ops.conv import (
        DIMS, _triple, conv3d_transpose, cylindrical_conv3d_transpose,
    )

    if all(s == 1 for s in _triple(stride)):
        op = cylindrical_conv3d_transpose if cylindrical else conv3d_transpose
        return op(x, w, b, stride=stride, padding=padding,
                  output_padding=output_padding)

    out_dtype = x.dtype

    def q_conv(xx, sub, pads):
        wq, sw = quantize_weight_per_cout(sub)
        xq = quantize_act(xx, sx)
        y = jax.lax.conv_general_dilated(
            xq, wq,
            window_strides=(1, 1, 1),
            padding=pads,
            dimension_numbers=DIMS,
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (sw * sx)).astype(out_dtype)

    op = cylindrical_conv3d_transpose if cylindrical else conv3d_transpose
    return op(x, w, b, stride=stride, padding=padding,
              output_padding=output_padding, conv_fn=q_conv)
