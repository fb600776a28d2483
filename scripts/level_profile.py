"""Per-resolution-level time attribution for the ds2 denoise step.

The round-3 roofline (roofline_report.json) showed the deep small-spatial
convs are latency-bound (0.41-0.65 ms isolated, 2-31% of lane-padded
ideal).  This script measures what the deep levels actually cost inside
the real fused program, by timing structural ablations of the U-Net:

  full            - the real CondUnet (fused attention on)
  no_attn         - all attention removed (known ceiling)
  l0_only         - deep part (everything below full resolution) replaced
                    by identity: down-L0 blocks + attn + final blocks only
  l01_only        - two levels (45x16x9 + 23x8x5), deepest level + mid
                    replaced by identity

deep cost ~= t(full) - t(l0_only); level-2+mid cost ~= t(full) - t(l01_only).

Timing: K serial denoise iterations inside one jitted scan (per-dispatch
timing is unreliable over the axon tunnel).

Run: python scripts/level_profile.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

from calodiffusion_tpu.models import nn_modules as M


BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
SHAPE = (45, 16, 9)
LS = [32, 32, 64, 32]
DTYPE = jnp.bfloat16


class TruncatedUnet(M.CondUnet):
    """CondUnet with the part below `keep_levels` resolutions replaced by
    identity (timing ablation only — not a real model)."""

    keep_levels: int = 1

    @nn.compact
    def __call__(self, x, cond=None, time=None, controls=None,
                 return_hiddens=False):
        ls = list(self.layer_sizes)
        in_out = list(zip(ls[:-1], ls[1:]))
        num_resolutions = len(in_out)
        half = self.cond_dim // 2

        x = x.astype(self.dtype)
        x = M.Conv3d(ls[0], kernel_size=3, padding=1,
                     cylindrical=self.cylindrical, dtype=self.dtype,
                     name="init_conv")(x)
        last_cond_size = half
        cond_hidden = half // 2
        c = M.CondMLP(hidden=cond_hidden, mid=half, out=last_cond_size,
                      embed=self.cond_embed, dtype=self.dtype,
                      name="cond_mlp")(cond)
        t = M.CondMLP(hidden=half // 2, mid=half, out=half,
                      embed=self.time_embed, dtype=self.dtype,
                      name="time_mlp")(time)
        conditions = jnp.concatenate([t, c], axis=-1)

        extras = self.compute_extra_upsamples(
            self.data_shape, num_resolutions, self.compress_Z)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            if ind >= self.keep_levels:
                break
            is_last = ind >= num_resolutions - 1
            x = self._block(dim_out)(x, conditions)
            x = self._block(dim_out)(x, conditions)
            if self.block_attn:
                x = M.PreNormResidual(
                    M.LinearAttention(cylindrical=self.cylindrical,
                                      dtype=self.dtype),
                    dtype=self.dtype)(x)
            hs.append(x)
            if not is_last and ind < self.keep_levels - 1:
                x = M.downsample_module(dim_out, self.cylindrical,
                                        self.compress_Z, self.dtype)(x)

        # identity in place of deeper levels + mid; up path mirrors the kept part
        for ind in range(self.keep_levels):
            dim_in, dim_out = in_out[self.keep_levels - 1 - ind]
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = self._block(dim_in)(x, conditions)
            x = self._block(dim_in)(x, conditions)
            if self.block_attn:
                x = M.PreNormResidual(
                    M.LinearAttention(cylindrical=self.cylindrical,
                                      dtype=self.dtype),
                    dtype=self.dtype)(x)
            if ind < self.keep_levels - 1:
                extra = extras[self.keep_levels - 2 - ind]
                x = M.upsample_module(dim_in, extra, self.cylindrical,
                                      self.compress_Z, self.dtype)(x)

        x = self._block(ls[0])(x, None)
        x = M.Conv3d(self.out_dim, kernel_size=1,
                     cylindrical=self.cylindrical, dtype=self.dtype,
                     name="final_conv")(x)
        return x.astype(jnp.float32)


def timed(name, model_kwargs, klass=M.CondUnet, iters=60):
    model = klass(
        out_dim=1, cond_dim=128, cylindrical=True, compress_Z=True,
        data_shape=SHAPE, cond_size=1, dtype=DTYPE, **model_kwargs)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, *SHAPE, 3), jnp.float32)
    cond = jnp.full((BATCH,), 0.5, jnp.float32)
    tvec = jnp.full((BATCH,), 0.3, jnp.float32)
    params = model.init(key, x, cond, tvec)

    @jax.jit
    def run(params, x):
        def body(carry, _):
            out = model.apply(params, carry, cond, tvec)
            # feed a 3-channel input again (pad the 1-channel output)
            nxt = jnp.concatenate([out] * 3, axis=-1).astype(jnp.float32)
            return nxt, None
        carry, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(carry)

    out = run(params, x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, x))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:28s}: {best * 1e3:7.2f} ms/denoise")
    return best


if __name__ == "__main__":
    full = timed("full [32,32,64,32]+attn", dict(
        layer_sizes=LS, block_attn=True, mid_attn=True))
    noat = timed("no attention", dict(
        layer_sizes=LS, block_attn=False, mid_attn=False))
    l01 = timed("levels 0+1 only (+attn)", dict(
        layer_sizes=LS, block_attn=True, mid_attn=False),
        klass=type("T2", (TruncatedUnet,), {"keep_levels": 2}))
    l0 = timed("level 0 only (+attn)", dict(
        layer_sizes=LS, block_attn=True, mid_attn=False),
        klass=type("T1", (TruncatedUnet,), {"keep_levels": 1}))
    l0_na = timed("level 0 only, no attn", dict(
        layer_sizes=LS, block_attn=False, mid_attn=False),
        klass=type("T1b", (TruncatedUnet,), {"keep_levels": 1}))
    print()
    print(f"attention total        : {(full - noat) * 1e3:6.2f} ms")
    print(f"deep part (below L0)   : {(full - l0) * 1e3:6.2f} ms")
    print(f"level2+mid (below L1)  : {(full - l01) * 1e3:6.2f} ms")
    print(f"L0-only attn cost      : {(l0 - l0_na) * 1e3:6.2f} ms")
