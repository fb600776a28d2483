"""Deep-level conv formulation A/B: XLA native conv vs explicit im2col matmul.

The round-3 roofline (roofline_report.json) showed the small-spatial deep
convs are stuck at a ~0.41-0.65 ms floor (0.8-28% MFU) despite negligible
FLOPs.  Hypothesis: XLA's TPU conv lowering pads each small spatial dim to
tile boundaries (5 -> 8, 3 -> 8, ...), multiplying the padding waste, while
an explicit im2col -> one flat [B*Z*A*R, 27C] @ [27C, Cout] matmul only pads
the two matmul dims once.

Run: python scripts/im2col_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from calodiffusion_tpu.ops.conv import cylindrical_conv3d, wrap_pad_phi

DTYPE = jnp.bfloat16


def im2col_cyl_conv3d(x, w, b=None):
    """3x3x3 stride-1 pad-1 cylindrical conv as shifted-slice im2col + matmul."""
    B, Z, A, R, C = x.shape
    kz, ka, kr, cin, cout = w.shape
    assert (kz, ka, kr) == (3, 3, 3) and cin == C
    xp = wrap_pad_phi(x, 1)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0)))
    cols = []
    for dz in range(3):
        for da in range(3):
            for dr in range(3):
                cols.append(
                    jax.lax.dynamic_slice(
                        xp, (0, dz, da, dr, 0), (B, Z, A, R, C)))
    patches = jnp.concatenate(cols, axis=-1)          # (B, Z, A, R, 27C)
    flat = patches.reshape(B * Z * A * R, 27 * C)
    wf = w.reshape(27 * C, cout)
    y = (flat @ wf).reshape(B, Z, A, R, cout)
    if b is not None:
        y = y + b
    return y


def timed(fn, params, x, iters=200):
    @jax.jit
    def run(params, x):
        def body(carry, _):
            out = fn(carry, *params)
            return out.astype(carry.dtype), None
        carry, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(carry)

    out = run(params, x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def case(name, B, spatial, cin, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, *spatial, cin), DTYPE)
    w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32) * 0.05
         ).astype(DTYPE)

    # correctness first
    ref = cylindrical_conv3d(x.astype(jnp.float32), w.astype(jnp.float32),
                             padding=1)
    got = im2col_cyl_conv3d(x.astype(jnp.float32), w.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))

    # cout != cin: project back so the scan carry keeps its shape
    proj = (jax.random.normal(key, (1, 1, 1, cout, cin), jnp.float32) * 0.05
            ).astype(DTYPE) if cout != cin else None

    def run_native(carry, w):
        y = cylindrical_conv3d(carry, w, padding=1)
        if proj is not None:
            y = cylindrical_conv3d(y, proj, padding=0)
        return y

    def run_im2col(carry, w):
        y = im2col_cyl_conv3d(carry, w)
        if proj is not None:
            y = cylindrical_conv3d(y, proj, padding=0)
        return y

    t_nat = timed(run_native, (w,), x)
    t_col = timed(run_im2col, (w,), x)
    flops = 2 * B * spatial[0] * spatial[1] * spatial[2] * 27 * cin * cout
    print(f"{name:26s} rel_err={err:.2e}  native={t_nat*1e3:7.3f} ms "
          f"({flops/t_nat/1e12:5.1f} TF)  im2col={t_col*1e3:7.3f} ms "
          f"({flops/t_col/1e12:5.1f} TF)  speedup={t_nat/t_col:5.2f}x")


if __name__ == "__main__":
    B = 128
    case("ds2 L1 23x8x5   32->32", B, (23, 8, 5), 32, 32)
    case("ds2 L2 12x4x3   64->64", B, (12, 4, 3), 64, 64)
    case("ds2 L2 12x4x3   64->32", B, (12, 4, 3), 64, 32)
    case("ds2 L0 45x16x9  32->32", B, (45, 16, 9), 32, 32)
    case("ds2 L0 45x16x9  32->64", B, (45, 16, 9), 32, 64)
    case("ds3 L1 23x25x9  32->32", B, (23, 25, 9), 32, 32)
    case("ds3 L2 12x13x5  64->64", B, (12, 13, 5), 64, 64)
    case("hgc L1 14x6x6   32->32", 64, (14, 6, 6), 32, 32)
