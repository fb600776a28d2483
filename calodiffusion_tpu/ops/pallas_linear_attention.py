"""Fused linear-attention Pallas kernel (qkv projection + softmaxes +
context/out einsums + output projection in one kernel, lane-packed).

Motivation (roofline_report.json, round 3): block LinearAttention costs
~34% of the 400-step sampling wall on BOTH ds2 and ds3 even though its
FLOPs are trivial.  The limiter is neither HBM nor the MXU but VPU *lane
utilization*: with C = dim_head = 32, every (N, 32)-shaped softmax/exp/mask
op occupies 32 of 128 lanes, so both XLA's pipeline and an (N, C)-layout
Pallas kernel sit at the same ~17 ms floor for the full-res ds3 block
(B=128, N=40.5k) — measured, see BASELINE.md round-3 table.

This kernel instead works in a transposed (C, N) layout so N fills the
lane dimension: every VPU op runs on full (8, 128) tiles.  XLA transposes
x in and y out (cheap, full-bandwidth); inside, per batch element:

    pass A over N-chunks:  k = W_k^T x  -> online max-rescaled softmax_N
                           accumulate ctx(d,e) = sum_n k'(d,n) v(e,n)
    pass B over N-chunks:  q = W_q^T x  -> softmax_d, * d^-1/2
                           y = W_o^T (ctx^T q') + b

Measured on the ds3 full-res block: 7.2 ms vs 17.0 ms for XLA (2.4x); the
(N, C)-layout variants tried first were 0.7-1.0x (see BASELINE.md).

Reference semantics: calodiffusion/models/models.py:281-318
(LinearAttention: q/k softmaxes + einsums).  heads=1, dim_head=32 is the
only configuration the reference instantiates.

Differentiation: `pallas_call` has no automatic VJP, and the training step
differentiates through block attention, so `fused_linear_attention` is a
`jax.custom_vjp`: forward = this kernel, backward = the VJP of the
mathematically-identical XLA formulation (`linear_attention_reference`).

Numerics: all reductions and exponentials run in f32; matches the XLA path
to ~1e-5 in f32 (see tests/test_pallas_linear_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_N_FOR_KERNEL = 4096  # below this the XLA path wins (dispatch overhead)
_MAX_SINGLE_CHUNK = 49152  # whole-sample chunk while VMEM temps stay small
_LANE = 512  # chunk-size quantum: keeps slices (8,128)-tile aligned


def _pick_chunk(n: int) -> tuple[int, int]:
    """(chunk, padded N).  Whole-sample chunks minimize loop trips (fastest,
    measured); above _MAX_SINGLE_CHUNK fall back to fixed 8192 chunks."""
    n_lane = (n + _LANE - 1) // _LANE * _LANE
    if n_lane <= _MAX_SINGLE_CHUNK:
        return n_lane, n_lane
    ch = 8192
    return ch, (n + ch - 1) // ch * ch


def _kernel(xt_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, yt_ref, *,
            n_total, ch, n_chunks, dim_head):
    """xt_ref: (1, C, N_PAD) transposed block; chunk views are (C, ch)."""
    f32 = jnp.float32
    cdt = xt_ref.dtype  # compute dtype for MXU operands

    def a_step(i, carry):
        m, s, acc = carry
        st = i * ch
        xb = xt_ref[0, :, pl.ds(st, ch)]                       # (C, ch)
        kb = jax.lax.dot_general(
            wk_ref[...], xb, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                        # (D, ch)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1) + st
        ok = lane < n_total
        kb = jnp.where(ok, kb, -jnp.inf)
        bm = jnp.max(kb, axis=1, keepdims=True)                # (D, 1)
        m_new = jnp.maximum(m, bm)
        resc = jnp.exp(m - m_new)
        w = jnp.exp(kb - m_new)                                # (D, ch) f32
        w = jnp.where(ok, w, 0.0)
        vb = jax.lax.dot_general(
            wv_ref[...], xb, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                        # (E, ch)
        # ctx(d, e) += sum_n w(d, n) vb(e, n)
        acc = acc * resc + jax.lax.dot_general(
            w.astype(cdt), vb.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                        # (D, E)
        s = s * resc + jnp.sum(w, axis=1, keepdims=True)       # (D, 1)
        return (m_new, s, acc)

    d = dim_head
    m0 = jnp.full((d, 1), -jnp.inf, f32)
    s0 = jnp.zeros((d, 1), f32)
    a0 = jnp.zeros((d, d), f32)
    m, s, acc = jax.lax.fori_loop(0, n_chunks, a_step, (m0, s0, a0))
    ctx = (acc / jnp.maximum(s, 1e-30)).astype(cdt)            # (D, E)

    def b_step(i, _):
        st = i * ch
        xb = xt_ref[0, :, pl.ds(st, ch)]
        qb = jax.lax.dot_general(
            wq_ref[...], xb, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                        # (D, ch)
        rm = jnp.max(qb, axis=0, keepdims=True)
        qe = jnp.exp(qb - rm)
        qs = (qe / jnp.sum(qe, axis=0, keepdims=True)
              * (d ** -0.5)).astype(cdt)                       # (D, ch)
        ob = jax.lax.dot_general(
            ctx, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                        # (E, ch)
        yb = jax.lax.dot_general(
            wo_ref[...], ob.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                        # (C, ch)
        yt_ref[0, :, pl.ds(st, ch)] = (yb + bo_ref[...]).astype(yt_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, b_step, 0)


def _fused_forward(x, w_qkv, w_out, b_out, dim_head, interpret):
    B, N, C = x.shape
    D = dim_head
    wq, wk, wv = w_qkv[:, :D], w_qkv[:, D:2 * D], w_qkv[:, 2 * D:]
    ch, n_pad = _pick_chunk(N)

    xt = jnp.swapaxes(x, 1, 2)                                 # (B, C, N)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - N)))
    yt = pl.pallas_call(
        functools.partial(_kernel, n_total=N, ch=ch,
                          n_chunks=n_pad // ch, dim_head=D),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, n_pad), lambda b: (b, 0, 0)),
                  pl.BlockSpec((C, D), lambda b: (0, 0)),
                  pl.BlockSpec((C, D), lambda b: (0, 0)),
                  pl.BlockSpec((C, D), lambda b: (0, 0)),
                  pl.BlockSpec((D, C), lambda b: (0, 0)),
                  pl.BlockSpec((C, 1), lambda b: (0, 0))],
        out_specs=pl.BlockSpec((1, C, n_pad), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, n_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xt, wq, wk, wv, w_out, b_out.reshape(C, 1).astype(jnp.float32))
    return jnp.swapaxes(yt[:, :, :N], 1, 2)                    # (B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(x, w_qkv, w_out, b_out, dim_head, interpret):
    return _fused_forward(x, w_qkv, w_out, b_out, dim_head, interpret)


def _fused_fwd(x, w_qkv, w_out, b_out, dim_head, interpret):
    return (_fused_forward(x, w_qkv, w_out, b_out, dim_head, interpret),
            (x, w_qkv, w_out, b_out))


def _fused_bwd(dim_head, interpret, res, g):
    x, w_qkv, w_out, b_out = res
    _, vjp = jax.vjp(
        lambda *a: linear_attention_reference(*a, dim_head=dim_head),
        x, w_qkv, w_out, b_out)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_linear_attention(x, w_qkv, w_out, b_out, dim_head: int = 32,
                           interpret: bool = False):
    """x: (B, N, C) channel-minor; w_qkv: (C, 3*D); w_out: (D, C);
    b_out: (C,).  Returns (B, N, C) = LinearAttention (heads=1) with the
    qkv/out 1x1 convs fused in.  Differentiable (custom VJP via the XLA
    formulation)."""
    return _fused(x, w_qkv, w_out, b_out, int(dim_head), bool(interpret))


def linear_attention_reference(x, w_qkv, w_out, b_out, dim_head: int = 32):
    """Plain-XLA equivalent (used on CPU / small N, as the test oracle, and
    as the backward formulation for the kernel's custom VJP)."""
    D = dim_head
    qkv = jnp.einsum("bnc,ck->bnk", x, w_qkv.astype(x.dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(x.dtype)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
    q = q * (D ** -0.5)
    ctx = jnp.einsum("bnd,bne->bde", k, v)
    out = jnp.einsum("bde,bnd->bne", ctx, q)
    y = jnp.einsum("bne,ec->bnc", out, w_out.astype(x.dtype))
    return y + b_out.astype(x.dtype)
