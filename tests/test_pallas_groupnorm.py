"""Fused GroupNorm+SiLU kernel vs reference math (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calodiffusion_tpu.ops.pallas_groupnorm import (
    _gn_silu_reference,
    groupnorm_silu,
)

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("shape,groups", [
    ((2, 5, 4, 3, 16), 8),
    ((3, 45, 16, 9, 32), 8),
    ((2, 7, 7, 32), 4),
])
def test_kernel_matches_reference(shape, groups):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    c = shape[-1]
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1

    ref = _gn_silu_reference(x, scale, bias, groups, 1e-5, True)
    out = groupnorm_silu(x, scale, bias, groups=groups, force=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_torch_groupnorm():
    b, z, a, r, c = 2, 5, 4, 3, 16
    groups = 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, z, a, r, c)).astype(np.float32)
    scale = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)

    gn = torch.nn.GroupNorm(groups, c)
    gn.weight.data = torch.tensor(scale)
    gn.bias.data = torch.tensor(bias)
    with torch.no_grad():
        tx = torch.tensor(np.moveaxis(x, -1, 1))  # (B, C, Z, A, R)
        ty = torch.nn.functional.silu(gn(tx)).numpy()
    ty = np.moveaxis(ty, 1, -1)

    out = groupnorm_silu(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                         groups=groups, force=True)
    np.testing.assert_allclose(np.asarray(out), ty, atol=2e-5)
