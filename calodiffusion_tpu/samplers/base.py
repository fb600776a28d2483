"""Sampler infrastructure.

Every sampler is a callable
``sampler(model, params, start, energy, layers, num_steps, sample_offset,
key, debug)`` mirroring the reference protocol (reference:
calodiffusion/models/sample.py:18-26).

TPU design: per-step scalars (sigmas, churn factors, solver coefficients)
are pure functions of ``num_steps`` and the config, so they are precomputed
host-side as numpy tables and the whole reverse trajectory runs as one
``lax.scan`` (or ``lax.while_loop`` for adaptive solvers) inside jit.  One
compilation per (num_steps, batch-shape); zero host<->device churn during
generation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def bshape(x):
    return (x.shape[0],) + (1,) * (x.ndim - 1)


def full_like_batch(value, x):
    """Broadcast a scalar to per-sample shape (B, 1, ..., 1)."""
    return jnp.full(bshape(x), value, dtype=jnp.float32)


class Sample:
    def __init__(self, config: dict) -> None:
        self.config = config
        self.sample_config = config.get("SAMPLER_OPTIONS", {})

    def make_denoise_fn(self, model, params, energy, layers):
        def denoise(x, sigma):
            return model.denoise(params, x, E=energy, sigma=sigma, layers=layers)

        return denoise

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ) -> Any:
        raise NotImplementedError
