"""Golden-value parity tests: JAX cylindrical conv ops vs torch CPU reference
semantics (torch Conv3d/ConvTranspose3d + manual circular phi padding, the
behavior defined at reference calodiffusion/models/models.py:25-96).

Layout note: the framework is channels-last (B, Z, A, R, C); torch is
channels-first (B, C, Z, A, R).  Tests transpose at the boundary.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from calodiffusion_tpu.ops.conv import (  # noqa: E402
    conv3d,
    conv3d_transpose,
    cylindrical_conv3d,
    cylindrical_conv3d_transpose,
)


def to_torch(x_nhwc):
    return torch.tensor(np.moveaxis(x_nhwc, -1, 1))


def from_torch(y):
    return np.moveaxis(y.detach().numpy(), 1, -1)


def rand(*shape):
    rng = np.random.default_rng(seed=sum(shape))
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("kernel,stride,padding", [
    (3, 1, 1),
    ((3, 4, 4), (1, 2, 2), 1),
    ((3, 4, 4), (2, 2, 2), 1),
    (1, 1, 0),
])
def test_plain_conv_matches_torch(kernel, stride, padding):
    cin, cout = 3, 5
    x = rand(2, 7, 8, 9, cin)
    k = kernel if isinstance(kernel, tuple) else (kernel,) * 3
    w = rand(*k, cin, cout)
    b = rand(cout)

    y = conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
               stride=stride, padding=padding)

    tw = torch.tensor(np.transpose(w, (4, 3, 0, 1, 2)))  # (out,in,kz,ka,kr)
    ty = torch.conv3d(to_torch(x), tw, torch.tensor(b),
                      stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(y), from_torch(ty), atol=2e-5)


@pytest.mark.parametrize("kernel,stride,padding", [
    (3, 1, 1),
    ((3, 4, 4), (1, 2, 2), 1),
    ((3, 4, 4), (2, 2, 2), 1),
])
def test_cylindrical_conv_matches_torch(kernel, stride, padding):
    """Reference: zero the phi padding in the conv, circular-pad phi manually."""
    cin, cout = 2, 4
    x = rand(2, 5, 8, 9, cin)
    k = kernel if isinstance(kernel, tuple) else (kernel,) * 3
    w = rand(*k, cin, cout)
    b = rand(cout)

    y = cylindrical_conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           stride=stride, padding=padding)

    p = padding if isinstance(padding, tuple) else (padding,) * 3
    tx = to_torch(x)
    tx = F.pad(tx, pad=(0, 0, p[1], p[1], 0, 0), mode="circular")
    tw = torch.tensor(np.transpose(w, (4, 3, 0, 1, 2)))
    ty = torch.conv3d(tx, tw, torch.tensor(b), stride=stride,
                      padding=(p[0], 0, p[2]))
    np.testing.assert_allclose(np.asarray(y), from_torch(ty), atol=2e-5)


@pytest.mark.parametrize("kernel,stride,padding,output_padding", [
    ((3, 4, 4), (1, 2, 2), 1, 0),
    ((3, 4, 4), (1, 2, 2), 1, (0, 0, 1)),
    ((4, 4, 4), (2, 2, 2), 1, 0),
    ((4, 4, 4), (2, 2, 2), 1, (0, 1, 1)),
])
def test_transpose_conv_matches_torch(kernel, stride, padding, output_padding):
    cin, cout = 3, 2
    x = rand(2, 5, 4, 3, cin)
    w = rand(*kernel, cin, cout)
    b = rand(cout)

    y = conv3d_transpose(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                         stride=stride, padding=padding,
                         output_padding=output_padding)

    tw = torch.tensor(np.transpose(w, (3, 4, 0, 1, 2)))  # (in,out,k...)
    ty = F.conv_transpose3d(to_torch(x), tw, torch.tensor(b), stride=stride,
                            padding=padding, output_padding=output_padding)
    np.testing.assert_allclose(np.asarray(y), from_torch(ty), atol=2e-5)


@pytest.mark.parametrize("kernel,stride,output_padding", [
    ((3, 4, 4), (1, 2, 2), 0),
    ((4, 4, 4), (2, 2, 2), 0),
    ((3, 4, 4), (1, 2, 2), (0, 0, 1)),
])
def test_cylindrical_transpose_matches_torch(kernel, stride, output_padding):
    """Reference recipe: circular-pad phi by nominal padding, then transpose
    conv with phi padding = k_phi - 1 (reference models.py:25-62)."""
    cin, cout = 2, 3
    padding = 1
    x = rand(2, 5, 8, 4, cin)
    w = rand(*kernel, cin, cout)
    b = rand(cout)

    y = cylindrical_conv3d_transpose(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        stride=stride, padding=padding, output_padding=output_padding)

    tx = to_torch(x)
    tx = F.pad(tx, pad=(0, 0, padding, padding, 0, 0), mode="circular")
    tw = torch.tensor(np.transpose(w, (3, 4, 0, 1, 2)))
    ty = F.conv_transpose3d(
        tx, tw, torch.tensor(b), stride=stride,
        padding=(padding, kernel[1] - 1, padding),
        output_padding=output_padding)
    np.testing.assert_allclose(np.asarray(y), from_torch(ty), atol=2e-5)


def test_cylindrical_conv_is_rotation_equivariant():
    """Rolling the input along phi must roll the output (stride-1 case)."""
    cin, cout = 2, 3
    x = rand(1, 4, 8, 5, cin)
    w = rand(3, 3, 3, cin, cout)
    y = np.asarray(cylindrical_conv3d(jnp.asarray(x), jnp.asarray(w), padding=1))
    x_roll = np.roll(x, 3, axis=2)
    y_roll = np.asarray(
        cylindrical_conv3d(jnp.asarray(x_roll), jnp.asarray(w), padding=1))
    np.testing.assert_allclose(np.roll(y, 3, axis=2), y_roll, atol=2e-5)
