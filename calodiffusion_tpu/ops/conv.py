"""TPU-native 3D convolution primitives for cylindrical calorimeter grids.

All tensors are channels-last ``(B, Z, A, R, C)`` (NDHWC) so XLA tiles the
convolutions straight onto the MXU; A (alpha/phi) is the periodic axis.

The signature op of this framework is the *cylindrical* convolution: circular
padding along phi combined with ordinary zero padding along Z and R
(reference behavior: calodiffusion/models/models.py:65-96 CylindricalConv,
:25-62 CylindricalConvTrans).  Here the wrap is a `jnp.pad(mode='wrap')` that
XLA fuses with the convolution's input pipeline; no gather/scatter involved.

Transpose convolutions reproduce torch's ``ConvTranspose3d`` geometry
(stride/padding/output_padding) exactly, via an input-dilated forward
convolution with a spatially flipped kernel - the formulation XLA lowers
best on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# (B, Z, A, R, C) activations; (kZ, kA, kR, C_in, C_out) kernels
DIMS = ("NDHWC", "DHWIO", "NDHWC")


def _triple(v) -> tuple[int, int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def wrap_pad_phi(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Circular padding on the phi axis (axis=2 of NDHWC)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0), (0, 0)), mode="wrap")


def conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=1,
    padding=0,
) -> jnp.ndarray:
    """Plain 3D conv with torch-style symmetric zero padding."""
    stride = _triple(stride)
    padding = _triple(padding)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=DIMS,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b
    return y


def cylindrical_conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=1,
    padding=0,
) -> jnp.ndarray:
    """Conv3d with circular padding on phi, zero padding on Z and R."""
    stride = _triple(stride)
    pz, pa, pr = _triple(padding)
    x = wrap_pad_phi(x, pa)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(pz, pz), (0, 0), (pr, pr)],
        dimension_numbers=DIMS,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b
    return y


def _conv3d_transpose_dilated(x, w, b, stride, padding, output_padding):
    """Transpose conv via input dilation (reference formulation).  Correct
    everywhere but slow on XLA:CPU, which executes lhs-dilated convs
    naively; kept for cross-checking the subpixel path."""
    k = w.shape[:3]
    pads = [
        (k[i] - 1 - padding[i], k[i] - 1 - padding[i] + output_padding[i])
        for i in range(3)
    ]
    w_flip = w[::-1, ::-1, ::-1]
    y = lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1, 1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=DIMS,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b
    return y


def _conv3d_transpose_subpixel(x, w, b, stride, padding, output_padding,
                               conv_fn=None):
    """Transpose conv via phase decomposition ("subpixel"): one stride-1
    conv with all s_z*s_a*s_r phase sub-kernels stacked on the output-channel
    axis, followed by a depth-to-space interleave.

    Math: with full (uncropped) transpose output
      y_full[m] = sum_i W[m - i*s] x[i],  m in [0, (in-1)*s + k),
    write m = q + s*t; then y_full[q + s*t] = sum_j W[q + s*j] x[t - j],
    i.e. each phase q is an ordinary convolution of x with the sub-kernel
    W_q[j] = W[q + s*j] (zero-padded to L = ceil(k/s) taps).  torch's
    padding/output_padding crop y_full[p : M - p + op].

    One dense conv + reshape keeps the MXU busy and avoids the dilated-conv
    slow path entirely.
    """
    sz, sa, sr = stride
    kz, ka, kr = w.shape[:3]
    c_in, c_out = w.shape[3], w.shape[4]
    Lz, La, Lr = -(-kz // sz), -(-ka // sa), -(-kr // sr)

    # build (Lz, La, Lr, Cin, sz, sa, sr, Cout) stack of flipped sub-kernels
    wp = jnp.zeros((Lz * sz, La * sa, Lr * sr, c_in, c_out), w.dtype)
    wp = wp.at[:kz, :ka, :kr].set(w)
    # wp[q + s*j] -> sub[j, q]
    sub = wp.reshape(Lz, sz, La, sa, Lr, sr, c_in, c_out)
    # flip tap order per phase for the correlation
    sub = sub[::-1, :, ::-1, :, ::-1, :]
    # (Lz, La, Lr, Cin, sz*sa*sr*Cout)
    sub = sub.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        Lz, La, Lr, c_in, sz * sa * sr * c_out
    )

    pads = [(Lz - 1, Lz - 1), (La - 1, La - 1), (Lr - 1, Lr - 1)]
    if conv_fn is not None:
        # pluggable core conv (ops/quant.py substitutes the int8 MXU one;
        # per-output-channel scales stay aligned because dequantization
        # happens before the phase interleave below)
        y = conv_fn(x, sub, pads)
    else:
        y = lax.conv_general_dilated(
            x, sub,
            window_strides=(1, 1, 1),
            padding=pads,
            dimension_numbers=DIMS,
            preferred_element_type=x.dtype,
        )
    bsz, tz, ta, tr, _ = y.shape
    # interleave: index m = t*s + q
    y = y.reshape(bsz, tz, ta, tr, sz, sa, sr, c_out)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        bsz, tz * sz, ta * sa, tr * sr, c_out
    )

    in_shape = x.shape[1:4]
    k = (kz, ka, kr)
    starts, stops = [], []
    need_pad = [0, 0, 0]
    for i in range(3):
        M = (in_shape[i] - 1) * stride[i] + k[i]
        start = padding[i]
        stop = M - padding[i] + output_padding[i]
        avail = y.shape[1 + i]
        if stop > avail:
            need_pad[i] = stop - avail
        starts.append(start)
        stops.append(stop)
    if any(need_pad):
        y = jnp.pad(
            y,
            [(0, 0)] + [(0, p) for p in need_pad] + [(0, 0)],
        )
    y = y[:, starts[0]:stops[0], starts[1]:stops[1], starts[2]:stops[2], :]
    if b is not None:
        y = y + b
    return y


def conv3d_transpose(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=1,
    padding=0,
    output_padding=0,
    impl: str = "subpixel",
    conv_fn=None,
) -> jnp.ndarray:
    """torch-parity ConvTranspose3d: out_i = (in_i-1)*s_i - 2*p_i + k_i + op_i.

    ``w`` has shape (kZ, kA, kR, C_in, C_out).  ``conv_fn`` (subpixel path
    only) replaces the core stride-1 conv — used by ops/quant.py for int8.
    """
    stride = _triple(stride)
    padding = _triple(padding)
    output_padding = _triple(output_padding)
    if impl == "dilated" or all(s == 1 for s in stride):
        return _conv3d_transpose_dilated(
            x, w, b, stride, padding, output_padding
        )
    return _conv3d_transpose_subpixel(x, w, b, stride, padding,
                                      output_padding, conv_fn=conv_fn)


def cylindrical_conv3d_transpose(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride=1,
    padding=0,
    output_padding=0,
    conv_fn=None,
) -> jnp.ndarray:
    """Cylindrical transpose conv.

    Matches the reference recipe: circular-pad phi by the *nominal* padding,
    then run the transpose conv with phi padding forced to ``k_phi - 1``
    (which crops the excess) while Z/R keep the nominal padding
    (reference: models.py:25-62).
    """
    stride = _triple(stride)
    pz, pa, pr = _triple(padding)
    k = w.shape[:3]
    x = wrap_pad_phi(x, pa)
    eff_padding = (pz, k[1] - 1, pr)
    return conv3d_transpose(
        x, w, b, stride=stride, padding=eff_padding,
        output_padding=output_padding, conv_fn=conv_fn,
    )


# ---------------------------------------------------------------------------
# torch-compatible initializers (healthy training dynamics parity)
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform(a=sqrt(5)) as used by torch Conv3d: U(-1/sqrt(fan_in), +)."""
    fan_in = shape[0] * shape[1] * shape[2] * shape[3]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax Dense kernels are (in, out): fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in):
    return torch_conv_bias_init(fan_in)
