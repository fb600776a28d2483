"""How much of the L0 (full-res) cost is GroupNorm / elementwise overhead?

Monkeypatches GroupNorm (and optionally SiLU) to identity inside the
level_profile TruncatedUnet and re-times the L0-only ablation.  The delta
bounds what a fused conv+GN+SiLU Pallas block could recover at L0.

Run: python scripts/l0_elementwise_ablation.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax.numpy as jnp

from calodiffusion_tpu.models import nn_modules as M
import importlib

lp = importlib.import_module("scripts.level_profile")


from typing import Any


class IdentityGN(nn.Module):
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return x


if __name__ == "__main__":
    T1 = type("T1", (lp.TruncatedUnet,), {"keep_levels": 1})
    base = lp.timed("L0 only, no attn", dict(
        layer_sizes=lp.LS, block_attn=False, mid_attn=False), klass=T1)

    real_gn = M.GroupNorm
    M.GroupNorm = IdentityGN
    no_gn = lp.timed("L0 only, no attn, no GN", dict(
        layer_sizes=lp.LS, block_attn=False, mid_attn=False), klass=T1)

    real_silu = nn.silu
    nn.silu = lambda x: x
    no_act = lp.timed("L0, no GN, no SiLU", dict(
        layer_sizes=lp.LS, block_attn=False, mid_attn=False), klass=T1)
    nn.silu = real_silu
    M.GroupNorm = real_gn

    print()
    print(f"GroupNorm cost at L0      : {(base - no_gn) * 1e3:6.2f} ms")
    print(f"SiLU cost at L0           : {(no_gn - no_act) * 1e3:6.2f} ms")
    print(f"convs-only L0 floor       : {no_act * 1e3:6.2f} ms")
