"""Validate + benchmark the Pallas kernels on the real TPU.

- blockwise attention: correctness vs dense at N=4k, timing at full-res
  dataset-3 size (N = 40500);
- fused GroupNorm+SiLU: correctness vs the jnp reference, timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from calodiffusion_tpu.ops.pallas_attention import (
    _dense_attention,
    blockwise_attention,
)
from calodiffusion_tpu.ops.pallas_groupnorm import (
    _gn_silu_reference,
    groupnorm_silu,
)


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    print("backend:", jax.default_backend())

    # correctness at N=4096
    b, h, n, d = 2, 4, 4096, 32
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    dense = _dense_attention(q, k, v, d ** -0.5)
    blocked = blockwise_attention(q, k, v, force=True)
    err = float(jnp.max(jnp.abs(dense - blocked)))
    print(f"attention max err @N=4096: {err:.2e}")
    assert err < 1e-3

    # timing at ds3 full-res
    n3 = 45 * 50 * 18
    q3, k3, v3 = (jax.random.normal(kk, (1, 4, n3, 32), jnp.bfloat16)
                  for kk in jax.random.split(key, 3))
    t_pallas = timeit(
        lambda a, b_, c: blockwise_attention(a, b_, c, force=True), q3, k3, v3,
        n=5,
    )
    print(f"blockwise attention @N={n3}: {t_pallas:.2f} ms "
          f"(dense would need {4*n3*n3*4/2**30:.1f} GiB of scores)")

    # fused groupnorm
    x = jax.random.normal(key, (128, 45, 16, 9, 32), jnp.bfloat16)
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    ref = _gn_silu_reference(x, scale, bias, 8, 1e-5, True)
    out = groupnorm_silu(x, scale, bias, groups=8, force=True)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                out.astype(jnp.float32))))
    print(f"groupnorm+silu max err: {err:.2e}")
    assert err < 0.04  # ~2 bf16 ulps at |y|~2: output-rounding, not math
    t_ref = timeit(
        jax.jit(lambda a: _gn_silu_reference(a, scale, bias, 8, 1e-5, True)), x
    )
    t_fused = timeit(
        lambda a: groupnorm_silu(a, scale, bias, groups=8, force=True), x
    )
    print(f"groupnorm+silu: XLA {t_ref:.3f} ms vs Pallas {t_fused:.3f} ms")
    print("PALLAS TPU CHECK OK")


if __name__ == "__main__":
    main()
