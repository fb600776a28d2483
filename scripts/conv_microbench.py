"""Micro-benchmark a single 3x3x3 conv on the TPU across batch sizes and
formulations, to locate the superlinear batch-scaling cliff seen in the
full U-Net (12.7ms @128 -> 36.6ms @256)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIMS = ("NDHWC", "DHWIO", "NDHWC")


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def conv_ndhwc(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=DIMS, preferred_element_type=x.dtype,
    )


def conv_flat2d(x, w):
    """Fold Z into batch; 2D conv over (A, R) with kz taps as channel shifts
    - not equivalent math, just a layout probe."""
    b, z, a, r, c = x.shape
    x2 = x.reshape(b * z, a, r, c)
    w2 = w[1]  # (ka, kr, C, C)
    return lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def conv_matmul(x, w):
    """im2col-free core tap: central 1x1x1 as pure matmul (upper bound)."""
    b, z, a, r, c = x.shape
    return (x.reshape(-1, c) @ w[1, 1, 1]).reshape(b, z, a, r, -1)


if __name__ == "__main__":
    dtype = jnp.bfloat16
    C = 32
    for batch in (64, 128, 192, 256, 384, 512):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (batch, 45, 16, 9, C), dtype)
        w = jax.random.normal(key, (3, 3, 3, C, C), dtype)
        t_conv = timeit(jax.jit(conv_ndhwc), x, w)
        t_2d = timeit(jax.jit(conv_flat2d), x, w)
        t_mm = timeit(jax.jit(conv_matmul), x, w)
        print(f"B={batch:4d}  conv3d={t_conv:7.3f}ms  conv2d(folded)={t_2d:7.3f}ms"
              f"  matmul-core={t_mm:7.3f}ms")
