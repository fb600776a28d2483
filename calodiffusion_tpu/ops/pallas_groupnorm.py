"""Fused GroupNorm + SiLU Pallas kernel.

The U-Net spends a significant slice of its per-step time in GroupNorm ->
SiLU chains (16+ instances per denoise step).  XLA computes these as
separate reduction + normalization passes; this kernel reads the activation
once per program, computes per-group statistics in VMEM, and writes the
normalized+activated output - one HBM round trip instead of several.

Layout: channels-last (B, Z, A, R, C), stats per (sample, group) over
(Z*A*R, C/groups), matching torch GroupNorm semantics (eps inside rsqrt).
Grid is over the batch; one sample's activation must fit VMEM (the shipped
shower grids are <= 45*50*18*96 floats ~ 15 MB in bf16 at the largest, and
U-Net-interior tensors are far smaller).

CPU (tests) runs in interpret mode; the jnp fallback is bit-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                    eps: float, apply_silu: bool):
    """Group statistics via one-hot matmuls: Mosaic dislikes splitting the
    lane (channel) dimension with reshapes, so the per-group reductions are
    expressed as (S, C) @ (C, G) contractions instead."""
    x = x_ref[...].astype(jnp.float32)           # (S, C) one sample
    s, c = x.shape
    cg = c // groups
    denom = float(s * cg)

    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (ch // cg == grp).astype(jnp.float32)      # (C, G)

    sums = jnp.dot(x, onehot, preferred_element_type=jnp.float32)    # (S, G)
    sq_sums = jnp.dot(x * x, onehot, preferred_element_type=jnp.float32)
    mean_g = sums.sum(axis=0, keepdims=True) / denom                  # (1, G)
    var_g = sq_sums.sum(axis=0, keepdims=True) / denom - mean_g**2

    # broadcast per-group stats back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(jax.lax.rsqrt(var_g + eps), onehot.T,
                    preferred_element_type=jnp.float32)

    y = (x - mean_c) * inv_c
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu",
                                             "force"))
def groupnorm_silu(x, scale, bias, groups: int = 8, eps: float = 1e-5,
                   apply_silu: bool = True, force: bool = False):
    """x: (B, ..., C) channels-last. Returns silu(groupnorm(x))."""
    on_tpu = jax.default_backend() == "tpu"
    if not force and not on_tpu:
        return _gn_silu_reference(x, scale, bias, groups, eps, apply_silu)

    b = x.shape[0]
    c = x.shape[-1]
    spatial = 1
    for dim in x.shape[1:-1]:
        spatial *= dim
    x2 = x.reshape(b, spatial, c)

    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                          apply_silu=apply_silu),
        grid=(b,),
        interpret=not on_tpu,
        in_specs=[
            pl.BlockSpec((None, spatial, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((None, spatial, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, spatial, c), x.dtype),
    )(x2, scale, bias)
    return out.reshape(x.shape)


def _gn_silu_reference(x, scale, bias, groups, eps, apply_silu):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    xg = xf.reshape(x.shape[0], *spatial, groups, c // groups)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = xg.mean(axis=axes, keepdims=True)
    var = xg.var(axis=axes, keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(xf.shape)
    y = xn * scale + bias
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig_dtype)
