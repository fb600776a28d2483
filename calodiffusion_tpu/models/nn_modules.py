"""Flax network modules: conditional 3D U-Net and dense denoisers.

Capability-parity with the reference network zoo (reference:
calodiffusion/models/models.py - CondUnet :523-777, ResnetBlock/Block
:147-200, ConvNextBlock :203-243, Attention/LinearAttention :246-318,
Upsample/Downsample :335-370, ResNet :392-457, FCN :460-520), re-designed
for TPU:

- channels-last (B, Z, A, R, C) activations everywhere -> convs land on the
  MXU without layout transposes;
- cylindrical convolutions via fused wrap-padding (ops/conv.py);
- attention over the flattened voxel grid as batched einsums;
- configurable compute dtype (bf16 compute / f32 params + norm statistics).

Shape bookkeeping for odd dimensions (the ``extra_upsample`` output-padding
dance, reference models.py:621-635) is reproduced exactly so every shipped
SHAPE_FINAL (Z in {45, 5, 7, 28, 47}) round-trips through the U-Net.
"""

from __future__ import annotations

import math
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from calodiffusion_tpu.ops.conv import (
    conv3d,
    conv3d_transpose,
    cylindrical_conv3d,
    cylindrical_conv3d_transpose,
    torch_conv_bias_init,
    torch_conv_kernel_init,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)


def _triple(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


class Conv3d(nn.Module):
    """3D convolution, optionally cylindrical (circular phi padding).

    ``quantize=True`` (set on the U-Net's inner block convs) opts the
    module into the sampling-only W8A8 int8 path (ops/quant.py): during a
    calibration trace it sows its input abs-max into the ``quant_stats``
    collection; during an int8 sampling trace it runs the s8 x s8 -> s32
    MXU conv with its calibrated static activation scale.  Everything
    else (training, val loss, CPU, no calibration) is bit-identical to
    the plain path."""

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    cylindrical: bool = False
    use_bias: bool = True
    zero_init: bool = False
    quantize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        c_in = x.shape[-1]
        kshape = (*k, c_in, self.features)
        kinit = nn.initializers.zeros if self.zero_init else torch_conv_kernel_init
        w = self.param("kernel", kinit, kshape).astype(self.dtype)
        b = None
        if self.use_bias:
            fan_in = c_in * k[0] * k[1] * k[2]
            binit = (
                nn.initializers.zeros if self.zero_init else torch_conv_bias_init(fan_in)
            )
            b = self.param("bias", binit, (self.features,)).astype(self.dtype)
        if self.quantize:
            from calodiffusion_tpu.ops import quant

            if quant.calibrating():
                self.sow(
                    quant.STATS_COL, "absmax",
                    jnp.max(jnp.abs(x)).astype(jnp.float32),
                )
            else:
                sx = quant.scale_for("/".join(self.path))
                if sx == quant.WEIGHT_ONLY:
                    # W8A16 diagnostic mode: int8-dequantized weights,
                    # full-precision activations/conv — isolates weight-
                    # vs activation-quantization error (no MXU speedup)
                    w = quant.dequantized_weight(w).astype(self.dtype)
                elif sx is not None:
                    return quant.int8_conv3d(
                        x.astype(self.dtype), w, b, sx,
                        stride=self.stride, padding=self.padding,
                        cylindrical=self.cylindrical,
                    )
        op = cylindrical_conv3d if self.cylindrical else conv3d
        return op(x.astype(self.dtype), w, b, stride=self.stride, padding=self.padding)


class Conv3dTranspose(nn.Module):
    """Transpose 3D convolution, optionally cylindrical.

    ``quantize=True`` (set on the U-Net's upsample convs) makes the
    sampling-only W8A8 int8 path *available* exactly like `Conv3d`
    (ops/quant.py), but it is opt-in via CALODIFF_INT8_TRANSPOSE=1:
    measured A/B on the v5e showed the int8 transpose conv is a small
    consistent LOSS (ds2 -0.3%, ds3 -1.8%) because the dequant pass
    before the subpixel phase interleave costs more than the int8 core
    conv saves (BASELINE.md dead-end table)."""

    features: int
    kernel_size: Any = (3, 4, 4)
    stride: Any = (1, 2, 2)
    padding: Any = 1
    output_padding: Any = 0
    cylindrical: bool = False
    use_bias: bool = True
    quantize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        c_in = x.shape[-1]
        kshape = (*k, c_in, self.features)
        w = self.param("kernel", torch_conv_kernel_init, kshape).astype(self.dtype)
        b = None
        if self.use_bias:
            # torch ConvTranspose fan_in = C_out * prod(k) from the (in,out,k)
            # weight layout; keep the same bound
            fan_in = self.features * k[0] * k[1] * k[2]
            b = self.param("bias", torch_conv_bias_init(fan_in), (self.features,))
            b = b.astype(self.dtype)
        if self.quantize and os.environ.get("CALODIFF_INT8_TRANSPOSE") == "1":
            from calodiffusion_tpu.ops import quant

            if quant.calibrating():
                self.sow(
                    quant.STATS_COL, "absmax",
                    jnp.max(jnp.abs(x)).astype(jnp.float32),
                )
            else:
                sx = quant.scale_for("/".join(self.path))
                if sx is not None:
                    return quant.int8_conv3d_transpose(
                        x.astype(self.dtype), w, b, sx,
                        stride=self.stride, padding=self.padding,
                        output_padding=self.output_padding,
                        cylindrical=self.cylindrical,
                    )
        op = cylindrical_conv3d_transpose if self.cylindrical else conv3d_transpose
        return op(
            x.astype(self.dtype), w, b,
            stride=self.stride, padding=self.padding,
            output_padding=self.output_padding,
        )


class Dense(nn.Module):
    """Linear layer with torch-style uniform init."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        w = self.param(
            "kernel", torch_linear_kernel_init, (c_in, self.features)
        ).astype(self.dtype)
        y = x.astype(self.dtype) @ w
        if self.use_bias:
            b = self.param("bias", torch_linear_bias_init(c_in), (self.features,))
            y = y + b.astype(self.dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm with f32 statistics regardless of compute dtype."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if c % self.num_groups:
            raise ValueError(f"channels {c} not divisible by {self.num_groups} groups")
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        import os

        if os.environ.get("CALODIF_GN_IDENTITY"):  # profiling escape hatch
            return x * scale + bias
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        spatial = xf.shape[1:-1]
        g = self.num_groups
        xg = xf.reshape(xf.shape[0], *spatial, g, c // g)
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = xg.mean(axis=axes, keepdims=True)
        var = xg.var(axis=axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        xf = xg.reshape(xf.shape)
        return (xf * scale + bias).astype(orig_dtype)


class SinusoidalPositionEmbeddings(nn.Module):
    """sin/cos positional embedding of a scalar (reference models.py:132-144)."""

    dim: int

    def __call__(self, t):
        half_dim = self.dim // 2
        freq = math.log(10000) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -freq)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class CondMLP(nn.Module):
    """Shared builder for the time / energy conditioning MLPs.

    embed=True  -> [Sinusoidal(hidden), Dense(mid), GELU, Dense(out)]
    embed=False -> [Dense(hidden), GELU, Dense(mid), GELU, Dense(out)]
    (reference models.py:578-608).
    """

    hidden: int
    mid: int
    out: int
    embed: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v):
        if v.ndim == 1:
            v = v[:, None]
        if self.embed:
            h = SinusoidalPositionEmbeddings(self.hidden)(v.reshape(-1))
        else:
            h = nn.gelu(Dense(self.hidden, dtype=self.dtype)(v), approximate=False)
        h = nn.gelu(Dense(self.mid, dtype=self.dtype)(h), approximate=False)
        return Dense(self.out, dtype=self.dtype)(h)


class Block(nn.Module):
    """conv(k3,p1) -> GroupNorm -> (scale/shift) -> SiLU (reference :147-169)."""

    features: int
    groups: int = 8
    cylindrical: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = Conv3d(
            self.features, kernel_size=3, padding=1,
            cylindrical=self.cylindrical, dtype=self.dtype, quantize=True,
        )(x)
        x = GroupNorm(self.groups, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two conv blocks with conditioning bias + residual (reference :172-200)."""

    features: int
    cond_emb_dim: int | None = None
    groups: int = 8
    cylindrical: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond_emb=None):
        h = Block(self.features, self.groups, self.cylindrical, self.dtype)(x)
        if self.cond_emb_dim is not None and cond_emb is not None:
            c = Dense(self.features, dtype=self.dtype)(nn.silu(cond_emb))
            h = h + c[:, None, None, None, :]
        h = Block(self.features, self.groups, self.cylindrical, self.dtype)(h)
        if x.shape[-1] != self.features:
            res = Conv3d(
                self.features, kernel_size=1, cylindrical=self.cylindrical,
                dtype=self.dtype, quantize=True,
            )(x)
        else:
            res = x
        return h + res


class ConvNextBlock(nn.Module):
    """ConvNext-style alternative block (reference :203-243)."""

    features: int
    cond_emb_dim: int | None = None
    mult: int = 2
    norm: bool = True
    cylindrical: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond_emb=None):
        dim = x.shape[-1]
        # depthwise 7x7x7: grouped conv == feature_group_count; emulate by
        # per-channel conv via vmapping a single-channel conv is wasteful -
        # use lax grouped conv through flax-less primitive
        h = _depthwise_conv7(x, self.cylindrical, self.dtype, self)
        if self.cond_emb_dim is not None and cond_emb is not None:
            c = Dense(dim, dtype=self.dtype)(nn.gelu(cond_emb, approximate=False))
            h = h + c[:, None, None, None, :]
        if self.norm:
            h = GroupNorm(1, dtype=self.dtype)(h)
        h = Conv3d(
            self.features * self.mult, kernel_size=3, padding=1,
            cylindrical=self.cylindrical, dtype=self.dtype, quantize=True,
        )(h)
        h = nn.gelu(h, approximate=False)
        h = GroupNorm(1, dtype=self.dtype)(h)
        h = Conv3d(
            self.features, kernel_size=3, padding=1,
            cylindrical=self.cylindrical, dtype=self.dtype, quantize=True,
        )(h)
        if dim != self.features:
            res = Conv3d(
                self.features, kernel_size=1, cylindrical=self.cylindrical,
                dtype=self.dtype, quantize=True,
            )(x)
        else:
            res = x
        return h + res


def _depthwise_conv7(x, cylindrical, dtype, mdl: nn.Module):
    from jax import lax

    c = x.shape[-1]
    w = mdl.param("ds_kernel", torch_conv_kernel_init, (7, 7, 7, 1, c)).astype(dtype)
    b = mdl.param("ds_bias", torch_conv_bias_init(7 * 7 * 7), (c,)).astype(dtype)
    if cylindrical:
        from calodiffusion_tpu.ops.conv import wrap_pad_phi

        x = wrap_pad_phi(x, 3)
        pads = [(3, 3), (0, 0), (3, 3)]
    else:
        pads = [(3, 3), (3, 3), (3, 3)]
    y = lax.conv_general_dilated(
        x.astype(dtype), w, window_strides=(1, 1, 1), padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
        preferred_element_type=dtype,
    )
    return y + b


class Attention(nn.Module):
    """Full softmax attention over the flattened voxel grid (reference :246-278)."""

    heads: int = 4
    dim_head: int = 32
    cylindrical: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from calodiffusion_tpu.ops.pallas_attention import blockwise_attention

        b, zz, aa, rr, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = Conv3d(
            hidden * 3, kernel_size=1, cylindrical=self.cylindrical,
            use_bias=False, dtype=self.dtype,
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            # (b, z, a, r, h*d) -> (b, h, N, d); channel index = h*dim_head + d
            t = t.reshape(b, zz * aa * rr, self.heads, self.dim_head)
            return t.transpose(0, 2, 1, 3)

        q, k, v = map(to_heads, (q, k, v))
        # dense for small grids / CPU; Pallas streaming kernel for full-res
        # grids (dataset-3: N = 40.5k voxels)
        out = blockwise_attention(q, k, v)
        # (b, h, N, d) -> (b, z, a, r, h*d)
        out = out.transpose(0, 2, 1, 3).reshape(b, zz, aa, rr, hidden)
        return Conv3d(
            c, kernel_size=1, cylindrical=self.cylindrical, dtype=self.dtype
        )(out)


class _RawGNParams(nn.Module):
    """Parameter-only stand-in for GroupNorm: declares the SAME scale/bias
    params under the SAME scope name (``name="GroupNorm_N"``) so checkpoints
    keep working while the normalization itself runs either in the fused
    attention-block kernel or via `_group_norm1`."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return scale, bias


def _group_norm1(x, scale, bias, eps=1e-5):
    """GroupNorm(num_groups=1) with explicit params: f32 stats over all
    non-batch axes, identical math (incl. the CALODIF_GN_IDENTITY profiling
    hatch) to the GroupNorm module above."""
    if os.environ.get("CALODIF_GN_IDENTITY"):
        return x * scale + bias
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, xf.ndim))
    mean = xf.mean(axis=axes, keepdims=True)
    var = xf.var(axis=axes, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * scale + bias).astype(orig_dtype)


def _fused_attn_enabled():
    """Dispatch gate for the fused attention kernels.  Gradient-bearing
    traces use them too: the block kernel has a Pallas backward in the same
    (C, N) lane-packed layout (ops/pallas_linear_attention.py), measured
    faster than the unfused XLA chain's VJP.  ``CALODIFF_FUSED_ATTN=0``
    disables entirely; ``=fwdonly`` restores the round-3 behavior of
    skipping the kernel in training traces."""
    from calodiffusion_tpu.ops.pallas_linear_attention import in_training_trace

    mode = os.environ.get("CALODIFF_FUSED_ATTN", "1")
    return (
        jax.default_backend() == "tpu"
        and mode != "0"
        and not (mode == "fwdonly" and in_training_trace())
    )


class _RawConvParams(nn.Module):
    """Parameter-only stand-in for a 1x1 Conv3d: declares the SAME param
    names/shapes/inits under the SAME scope name (``name="Conv3d_N"``), so
    checkpoints and tools/torch_import keep working while the matmul itself
    runs inside the fused attention kernel."""

    features: int
    kshape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        w = self.param("kernel", torch_conv_kernel_init, self.kshape)
        b = None
        if self.use_bias:
            fan_in = int(math.prod(self.kshape[:-1]))
            b = self.param(
                "bias", torch_conv_bias_init(fan_in), (self.features,)
            )
        return w, b


class LinearAttention(nn.Module):
    """O(N) linear attention (reference :281-318).

    On TPU at large N the whole block (qkv 1x1 conv -> softmaxes ->
    context/out einsums -> out 1x1 conv) runs as a fused two-pass Pallas
    kernel with VMEM-resident weights (ops/pallas_linear_attention.py):
    block attention is HBM-traffic-bound, ~34% of the 400-step sampling
    wall on ds2/ds3 via the unfused XLA pipeline (roofline_report.json)."""

    heads: int = 1
    dim_head: int = 32
    cylindrical: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prenorm=None, residual=False):
        """`prenorm=(scale, bias)` + `residual=True` is the fused-block
        entry used by PreNormResidual: pre-GN, attention, post-GN, and the
        residual add all run in one Pallas kernel (VMEM-resident slab)."""
        from calodiffusion_tpu.ops.pallas_linear_attention import (
            MIN_N_FOR_KERNEL,
            fused_attention_block,
            fused_linear_attention,
            linear_attention_reference,
        )

        b, zz, aa, rr, c = x.shape
        n = zz * aa * rr
        hidden = self.heads * self.dim_head
        # param layout identical to the previous Conv3d submodules
        w_qkv, _ = _RawConvParams(
            features=hidden * 3, kshape=(1, 1, 1, c, hidden * 3),
            use_bias=False, name="Conv3d_0",
        )()
        w_out, b_out = _RawConvParams(
            features=c, kshape=(1, 1, 1, hidden, c), name="Conv3d_1"
        )()
        gn_scale, gn_bias = _RawGNParams(name="GroupNorm_0")(c)
        w_qkv5, w_out5 = w_qkv, w_out  # (1,1,1,Cin,Cout) conv layouts
        w_qkv = w_qkv.reshape(c, hidden * 3)
        w_out = w_out.reshape(hidden, c)

        use_kernel = (
            self.heads == 1
            and _fused_attn_enabled()
            and n >= MIN_N_FOR_KERNEL
            and not os.environ.get("CALODIF_GN_IDENTITY")
        )
        if prenorm is not None and use_kernel:
            pre_scale, pre_bias = prenorm
            out = fused_attention_block(
                x.reshape(b, n, c).astype(self.dtype),
                pre_scale, pre_bias,
                w_qkv.astype(self.dtype), w_out.astype(self.dtype),
                b_out.astype(jnp.float32), gn_scale, gn_bias,
                dim_head=self.dim_head,
            )
            return out.reshape(b, zz, aa, rr, c)
        if prenorm is not None:  # fallback: un-fused but same params/math
            pre_scale, pre_bias = prenorm
            skip = x
            x = _group_norm1(x, pre_scale, pre_bias)

        from calodiffusion_tpu.ops.pallas_linear_attention import (
            in_training_trace,
        )

        if in_training_trace():
            # gradient-bearing trace: the 1x1-conv heads-first formulation —
            # XLA schedules its backward ~5% faster than the flattened
            # einsum chain's (58 -> 55.6 ms ds2 train step, measured)
            from calodiffusion_tpu.ops.conv import conv3d

            qkv = conv3d(x.astype(self.dtype), w_qkv5.astype(self.dtype))
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads_first(t):
                t = t.reshape(b, n, self.heads, self.dim_head)
                return t.transpose(0, 2, 3, 1)  # (b, h, d, N)

            q, k, v = map(heads_first, (q, k, v))
            q = jax.nn.softmax(q.astype(jnp.float32), axis=-2).astype(v.dtype)
            k = jax.nn.softmax(k.astype(jnp.float32), axis=-1).astype(v.dtype)
            q = q * (self.dim_head ** -0.5)
            context = jnp.einsum("bhdn,bhen->bhde", k, v)
            out = jnp.einsum("bhde,bhdn->bhen", context, q)
            out = out.reshape(b, hidden, n).transpose(0, 2, 1)
            out = out.reshape(b, zz, aa, rr, hidden)
            out = conv3d(
                out, w_out5.astype(out.dtype), b_out.astype(out.dtype)
            )
            out = _group_norm1(out, gn_scale, gn_bias)
            if prenorm is not None and residual:
                out = skip + out
            return out

        xf = x.reshape(b, n, c)
        if self.heads == 1 and use_kernel:
            out = fused_linear_attention(
                xf.astype(self.dtype), w_qkv.astype(self.dtype),
                w_out.astype(self.dtype), b_out.astype(jnp.float32),
                dim_head=self.dim_head,
            )
        elif self.heads == 1:
            out = linear_attention_reference(
                xf.astype(self.dtype), w_qkv, w_out, b_out,
                dim_head=self.dim_head,
            )
        else:  # generic multi-head path (not instantiated by the reference)
            qkv = jnp.einsum(
                "bnc,ck->bnk", xf.astype(self.dtype),
                w_qkv.astype(self.dtype),
            )
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def to_heads(t):
                return t.reshape(b, n, self.heads, self.dim_head)

            q, k, v = map(to_heads, (q, k, v))
            q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(v.dtype)
            k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(v.dtype)
            q = q * (self.dim_head ** -0.5)
            context = jnp.einsum("bnhd,bnhe->bhde", k, v)
            out = jnp.einsum("bhde,bnhd->bnhe", context, q)
            out = out.reshape(b, n, hidden)
            out = jnp.einsum(
                "bne,ec->bnc", out, w_out.astype(out.dtype)
            ) + b_out.astype(out.dtype)
        out = out.reshape(b, zz, aa, rr, c)
        out = _group_norm1(out, gn_scale, gn_bias)
        if prenorm is not None and residual:
            out = skip + out
        return out


class PreNormResidual(nn.Module):
    """x + fn(GroupNorm(x)) (reference Residual(PreNorm(...)) :111-117, :321-329).

    When fn is the reference-config LinearAttention (heads=1) at kernel-size
    N on TPU, the whole block runs as one fused Pallas kernel (pre-GN +
    attention + post-GN + residual, ops/pallas_linear_attention.py); the
    GroupNorm params live under the same GroupNorm_0 scope either way."""

    fn: nn.Module
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from calodiffusion_tpu.ops.pallas_linear_attention import (
            MIN_N_FOR_KERNEL,
        )

        scale, bias = _RawGNParams(name="GroupNorm_0")(x.shape[-1])
        n = math.prod(x.shape[1:-1])
        if (
            isinstance(self.fn, LinearAttention)
            and self.fn.heads == 1
            and _fused_attn_enabled()
            and n >= MIN_N_FOR_KERNEL
            and not os.environ.get("CALODIF_GN_IDENTITY")
        ):
            return self.fn(x, prenorm=(scale, bias), residual=True)
        return x + self.fn(_group_norm1(x, scale, bias))


def downsample_module(dim, cylindrical, compress_Z, dtype):
    z_stride = 2 if compress_Z else 1
    return Conv3d(
        dim, kernel_size=(3, 4, 4), stride=(z_stride, 2, 2), padding=1,
        cylindrical=cylindrical, dtype=dtype, quantize=True,
    )


def upsample_module(dim, extra_upsample, cylindrical, compress_Z, dtype):
    z_stride = 2 if compress_Z else 1
    z_kernel = 4 if extra_upsample[0] > 0 else 3
    extra = (0, extra_upsample[1], extra_upsample[2])
    return Conv3dTranspose(
        dim, kernel_size=(z_kernel, 4, 4), stride=(z_stride, 2, 2), padding=1,
        output_padding=extra, cylindrical=cylindrical, dtype=dtype,
        quantize=True,
    )


class CondUnet(nn.Module):
    """Conditional 3D U-Net (reference models.py:523-777).

    Input/output are channels-last (B, Z, A, R, C).
    """

    out_dim: int = 1
    layer_sizes: Sequence[int] = (32, 32, 64, 32)
    channels: int = 1
    cond_dim: int = 128
    resnet_block_groups: int = 8
    use_convnext: bool = False
    mid_attn: bool = False
    block_attn: bool = False
    compress_Z: bool = False
    convnext_mult: int = 2
    cylindrical: bool = False
    data_shape: Sequence[int] = (45, 16, 9)  # (Z, A, R)
    time_embed: bool = True
    cond_embed: bool = True
    cond_size: int = 1
    no_time: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    def _block(self, features):
        if self.use_convnext:
            klass = ConvNextBlock
            kwargs = dict(
                features=features, cond_emb_dim=self.cond_dim,
                mult=self.convnext_mult, cylindrical=self.cylindrical,
                dtype=self.dtype,
            )
        else:
            klass = ResnetBlock
            kwargs = dict(
                features=features, cond_emb_dim=self.cond_dim,
                groups=self.resnet_block_groups, cylindrical=self.cylindrical,
                dtype=self.dtype,
            )
        if self.remat:
            # rematerialize block activations in backward: trades FLOPs for
            # HBM so larger batches / deeper nets fit
            klass = nn.remat(klass)
        return klass(**kwargs)

    @staticmethod
    def compute_extra_upsamples(data_shape, num_resolutions, compress_Z):
        """Shape bookkeeping for odd dims (reference models.py:621-635)."""
        cur = tuple(data_shape)
        extras = []
        for ind in range(num_resolutions - 1):
            extras.append(((cur[0] + 1) % 2, cur[1] % 2, cur[2] % 2))
            z = cur[0] if not compress_Z else math.ceil(cur[0] / 2.0)
            cur = (z, cur[1] // 2, cur[2] // 2)
        return extras

    @nn.compact
    def __call__(self, x, cond=None, time=None, controls=None,
                 return_hiddens=False):
        ls = list(self.layer_sizes)
        in_out = list(zip(ls[:-1], ls[1:]))
        num_resolutions = len(in_out)
        half = self.cond_dim // 2

        x = x.astype(self.dtype)
        x = Conv3d(
            ls[0], kernel_size=3, padding=1, cylindrical=self.cylindrical,
            dtype=self.dtype, name="init_conv",
        )(x)

        # conditioning vector: [time_emb | cond_emb] (reference :701-709)
        last_cond_size = half if not self.no_time else self.cond_dim
        cond_hidden = max(self.cond_size, half // 2)
        c = CondMLP(
            hidden=cond_hidden if not self.cond_embed else half // 2,
            mid=half, out=last_cond_size, embed=self.cond_embed,
            dtype=self.dtype, name="cond_mlp",
        )(cond)
        if not self.no_time:
            t = CondMLP(
                hidden=half // 2, mid=half, out=half, embed=self.time_embed,
                dtype=self.dtype, name="time_mlp",
            )(time)
            conditions = jnp.concatenate([t, c], axis=-1)
        else:
            conditions = c

        extras = self.compute_extra_upsamples(
            self.data_shape, num_resolutions, self.compress_Z
        )

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_resolutions - 1
            x = self._block(dim_out)(x, conditions)
            x = self._block(dim_out)(x, conditions)
            if self.block_attn:
                x = PreNormResidual(
                    LinearAttention(cylindrical=self.cylindrical, dtype=self.dtype),
                    dtype=self.dtype,
                )(x)
            hs.append(x)
            if not is_last:
                x = downsample_module(
                    dim_out, self.cylindrical, self.compress_Z, self.dtype
                )(x)

        # ControlNet-style injection into the skip states (reference :722-737)
        if controls is not None:
            hs = [add_fn(h, ch) for h, (add_fn, ch) in zip(hs, controls[:-1])]

        mid_dim = ls[-1]
        x = self._block(mid_dim)(x, conditions)
        if self.mid_attn:
            x = PreNormResidual(
                LinearAttention(cylindrical=self.cylindrical, dtype=self.dtype),
                dtype=self.dtype,
            )(x)
        x = self._block(mid_dim)(x, conditions)

        if controls is not None:
            add_fn, ch = controls[-1]
            x = add_fn(x, ch)

        if return_hiddens:
            # ControlNet hidden-state collection (reference models.py:750-777)
            return hs + [x]

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind >= num_resolutions - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = self._block(dim_in)(x, conditions)
            x = self._block(dim_in)(x, conditions)
            if self.block_attn:
                x = PreNormResidual(
                    LinearAttention(cylindrical=self.cylindrical, dtype=self.dtype),
                    dtype=self.dtype,
                )(x)
            if not is_last:
                extra = extras.pop()
                x = upsample_module(
                    dim_in, extra, self.cylindrical, self.compress_Z, self.dtype
                )(x)

        x = self._block(ls[0])(x, None)
        x = Conv3d(
            self.out_dim, kernel_size=1, cylindrical=self.cylindrical,
            dtype=self.dtype, name="final_conv",
        )(x)
        return x.astype(jnp.float32)


class ResDenseLayer(nn.Module):
    """Single dense-resnet layer (reference ResDense :373-389)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        h = nn.gelu(Dense(self.features, dtype=self.dtype)(x), approximate=False)
        emb = Dense(self.features, dtype=self.dtype)(
            nn.gelu(cond, approximate=False)
        )
        h = h + emb
        h = nn.gelu(Dense(self.features, dtype=self.dtype)(h), approximate=False)
        return h + x


class ResNetDense(nn.Module):
    """FC residual net - layer-energy model / FCN shower option
    (reference ResNet :392-457)."""

    dim_in: int = 45
    num_layers: int = 3
    hidden_dim: int = 256
    cond_emb_dim: int = 128
    cond_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond=None, time=None, controls=None):
        half = self.cond_emb_dim // 2
        t = CondMLP(
            hidden=half // 2, mid=half, out=half, embed=False,
            dtype=self.dtype, name="time_mlp",
        )(time)
        c = CondMLP(
            hidden=half // 2, mid=half, out=half, embed=False,
            dtype=self.dtype, name="cond_mlp",
        )(cond)
        conditions = jnp.concatenate([c, t], axis=-1)

        x = Dense(self.hidden_dim, dtype=self.dtype, name="in_lay")(x)
        for i in range(self.num_layers - 1):
            x = ResDenseLayer(self.hidden_dim, dtype=self.dtype)(x, conditions)
        return Dense(self.dim_in, dtype=self.dtype, name="out_lay")(x)


class FCN(nn.Module):
    """Plain MLP denoiser (reference FCN :460-520)."""

    dim_in: int = 356
    num_layers: int = 4
    cond_emb_dim: int = 64
    time_embed: bool = True
    cond_embed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond=None, time=None):
        half = self.cond_emb_dim // 2
        t = CondMLP(
            hidden=half // 2, mid=half, out=half, embed=self.time_embed,
            dtype=self.dtype, name="time_mlp",
        )(time)
        c = CondMLP(
            hidden=half // 2, mid=half, out=half, embed=self.cond_embed,
            dtype=self.dtype, name="cond_mlp",
        )(cond)
        x = jnp.concatenate([x, t, c], axis=-1)
        x = Dense(self.dim_in, dtype=self.dtype)(x)
        for _ in range(self.num_layers - 1):
            x = nn.gelu(x, approximate=False)
            x = Dense(self.dim_in, dtype=self.dtype)(x)
        return x
