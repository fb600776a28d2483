"""ControlNet-style conditioning for the shower U-Net.

The reference ships a ControlNet composition that cannot import (dead module,
reference: calodiffusion/models/ControlNet.py:4-6 imports a nonexistent
class) but leaves live hooks in the U-Net (controls injection,
models.py:722-737; get_hiddens :750-777; gated ScalarAddLayer :120-129).
This is the working TPU implementation of the intended design:

- a *control* U-Net consumes the control image (e.g. the per-energy-bin
  average shower) and emits its down-path + mid hidden states;
- each hidden state is injected into the matching skip connection of the
  *base* U-Net through a learnable scalar gate
  out = (1 - mu) * h_base + mu * h_control, with mu initialized ~0 so the
  control branch starts as a no-op.

Training recipe: freeze the base parameters (optax.masked / tree surgery)
and train only {control, gates}.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from calodiffusion_tpu.models.nn_modules import CondUnet


class ControlledUnet(nn.Module):
    """Base U-Net + control U-Net with gated hidden-state injection."""

    unet_kwargs: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_control, cond=None, time=None):
        control_net = CondUnet(
            **self.unet_kwargs, dtype=self.dtype, name="control_model"
        )
        hiddens = control_net(x_control, cond=cond, time=time,
                              return_hiddens=True)

        mus = [
            self.param(f"gate_mu_{i}", nn.initializers.constant(1e-6), ())
            for i in range(len(hiddens))
        ]
        controls = [
            ((lambda a, b, mu=mu: (1 - mu) * a + mu * b), h)
            for mu, h in zip(mus, hiddens)
        ]

        base = CondUnet(**self.unet_kwargs, dtype=self.dtype, name="model")
        return base(x, cond=cond, time=time, controls=controls)


def base_param_filter(path: tuple, _value) -> bool:
    """True for base-model params (to freeze during ControlNet training)."""
    return any("model" == p or str(p).startswith("model/") for p in path) and \
        not any("control_model" in str(p) for p in path)
