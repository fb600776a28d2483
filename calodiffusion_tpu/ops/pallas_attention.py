"""Blockwise (flash) attention Pallas kernel for large voxel grids.

The reference's full softmax ``Attention`` materializes the (N x N) score
matrix over the flattened voxel grid (reference: calodiffusion/models/
models.py:264-278).  That is fine at U-Net-interior resolutions (N ~ 2-3k)
but O(N^2) memory at full-resolution dataset-3 (N = 45*50*18 = 40.5k:
a 1.6G-element score tensor per head).  This kernel computes the same
softmax attention with online (streaming) normalization, never
materializing scores beyond a (BQ x BK) tile.

TPU mapping: the grid is (batch*heads, q_blocks, kv_blocks) with the KV
index innermost - TPU grids execute sequentially, so the running max /
denominator / accumulator live in VMEM scratch that persists across KV
steps, and Pallas double-buffers the KV block HBM->VMEM copies
automatically.  Padded KV rows are masked to -inf before the softmax.

Math matches the reference exactly: scores = (q * D^-0.5) @ k^T, softmax
with running-max subtraction, out = attn @ v.

On non-TPU backends (tests run on CPU) the kernel runs in interpret mode;
small grids use the dense jnp formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                      block_k: int, scale: float, n_valid: int):
    """Program (bh, qi, ki): one KV block against one Q block."""
    ki = pl.program_id(2)
    n_kv_blocks = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.float32) * scale          # (BQ, D)
    k = k_ref[...].astype(jnp.float32)                  # (BK, D)
    v = v_ref[...].astype(jnp.float32)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * alpha + p.sum(axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _dense_attention(q, k, v, scale):
    """Reference-math dense fallback (and small-N path)."""
    qf = q.astype(jnp.float32) * scale
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, k.astype(jnp.float32))
    s = s - jax.lax.stop_gradient(s.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _pad_to(x, axis, multiple):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "force"))
def blockwise_attention(q, k, v, block_q: int = 512, block_k: int = 512,
                        force: bool = False):
    """Softmax attention over (B, H, N, D) tensors.

    Uses the Pallas streaming kernel on TPU for large N; falls back to the
    dense formulation on CPU or for small grids.
    """
    b, h, n, d = q.shape
    scale = d ** -0.5
    on_tpu = jax.default_backend() == "tpu"
    if not force and (not on_tpu or n <= 2048):
        return _dense_attention(q, k, v, scale)

    # Q rows pad freely (cropped after); padded KV rows are masked to -inf
    # inside the kernel.
    q_p, n_q = _pad_to(q, 2, block_q)
    k_p, _ = _pad_to(k, 2, block_k)
    v_p, _ = _pad_to(v, 2, block_k)

    qq = q_p.reshape(b * h, q_p.shape[2], d)
    kk = k_p.reshape(b * h, k_p.shape[2], d)
    vv = v_p.reshape(b * h, v_p.shape[2], d)

    n_q_pad = qq.shape[1]
    n_kv_pad = kk.shape[1]
    grid = (b * h, n_q_pad // block_q, n_kv_pad // block_k)

    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(_attention_kernel, block_k=block_k, scale=scale,
                          n_valid=n),
        grid=grid,
        interpret=not on_tpu,  # CPU tests exercise the kernel in interpret mode
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((None, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running denom
            pltpu.VMEM((block_q, d), jnp.float32),   # running numerator
        ],
    )(qq, kk, vv)

    out = out[:, :n_q, :].reshape(b, h, n_q, d)
    return out
