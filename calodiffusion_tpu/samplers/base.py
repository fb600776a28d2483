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
        self._noise_table: np.ndarray | None = None
        self._noise_cursor = 0

    # -- deterministic noise injection (parity testing / reproducibility) ---
    def set_noise_table(self, table) -> None:
        """Override PRNG normals with rows of ``table`` (consumed in draw
        order).  Each stochastic draw of a full sample-shaped normal takes
        one row; the golden trajectory-parity tests feed the same table to
        the reference sampler's ``torch.randn``/``randn_like`` so both
        frameworks walk identical stochastic paths."""
        self._noise_table = np.asarray(table, dtype=np.float32)
        self._noise_cursor = 0

    @property
    def noise_draws(self) -> int:
        """Rows consumed from the injected table so far."""
        return self._noise_cursor

    def take_noise(self, n: int, shape) -> jnp.ndarray | None:
        """Next ``n`` injected draws as an (n, *shape) array, or None when
        no table is set (use PRNG normals).  Host-side: called at trace
        time, so the rows become constants of the compiled sampler."""
        if self._noise_table is None:
            return None
        end = self._noise_cursor + n
        if end > len(self._noise_table):
            raise ValueError(
                f"noise table exhausted: need {n} more draws at cursor "
                f"{self._noise_cursor}, table has {len(self._noise_table)}"
            )
        rows = self._noise_table[self._noise_cursor:end].reshape((n, *shape))
        self._noise_cursor = end
        return jnp.asarray(rows)

    def make_denoise_fn(self, model, params, energy, layers):
        def denoise(x, sigma):
            return model.denoise(params, x, E=energy, sigma=sigma, layers=layers)

        return denoise

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ) -> Any:
        raise NotImplementedError
