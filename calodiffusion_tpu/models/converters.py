"""Trainable geometry embedding for CaloChallenge dataset 1.

``NNConverter`` lifts :class:`~calodiffusion_tpu.utils.geom.GeomConverter`'s
fixed area-weighted rebinning into per-layer trainable linear maps,
initialized at the geometric maps (+eps noise) and their pseudo-inverses
(reference: calodiffusion/utils/utils.py:576-656).

Because dataset-1 layers are ragged (different radial bin counts, some with a
single alpha bin), encode/decode are expressed as a sequence of small dense
contractions; with ~24-30 output radial bins these are tiny and fuse into a
single XLA computation - no host round trips.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from calodiffusion_tpu.utils.geom import GeomConverter


def _init_from(mat: np.ndarray, eps: float = 1e-5, seed: int = 0):
    noise = np.random.default_rng(seed).standard_normal(mat.shape).astype(np.float32)
    init_val = mat + eps * noise

    def init(key, shape, dtype=jnp.float32):
        assert tuple(shape) == init_val.shape, (shape, init_val.shape)
        return jnp.asarray(init_val, dtype)

    return init


class NNConverter(nn.Module):
    """Trainable irregular<->regular map. Params: enc_i / dec_i weights."""

    gc: GeomConverter
    dtype: Any = jnp.float32

    def setup(self):
        encs = []
        decs = []
        for i, mat in enumerate(self.gc.weight_mats):
            # enc weight (dim_r_out, dim_in); dec weight (dim_in, dim_r_out)
            encs.append(
                self.param(f"enc_{i}", _init_from(mat, seed=2 * i), mat.shape)
            )
            inv = self.gc.weight_mats_inv[i]
            decs.append(
                self.param(f"dec_{i}", _init_from(inv, seed=2 * i + 1), inv.shape)
            )
        self.encs = encs
        self.decs = decs

    def enc(self, x_flat: jnp.ndarray) -> jnp.ndarray:
        """(B, total_bins) -> (B, num_layers, alpha_out, dim_r_out)."""
        gc = self.gc
        outs = []
        for i in range(gc.num_layers):
            lo, hi = gc.layer_boundaries[i], gc.layer_boundaries[i + 1]
            seg = x_flat[:, lo:hi].reshape(x_flat.shape[0], int(gc.lay_alphas[i]), -1)
            o = jnp.einsum("ij,baj->bai", self.encs[i].astype(self.dtype), seg)
            if gc.lay_alphas[i] == 1:
                o = jnp.repeat(o, gc.alpha_out, axis=-2) / gc.alpha_out
            elif gc.lay_alphas[i] != gc.alpha_out:
                raise ValueError(f"layer {i}: unsupported alpha count")
            outs.append(o)
        return jnp.stack(outs, axis=1)

    def dec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, num_layers, alpha_out, dim_r_out) -> (B, total_bins)."""
        gc = self.gc
        outs = []
        for i in range(gc.num_layers):
            o = jnp.einsum("ij,baj->bai", self.decs[i].astype(self.dtype), x[:, i])
            if gc.lay_alphas[i] == 1:
                o = jnp.sum(o, axis=-2, keepdims=True)
            outs.append(o.reshape(o.shape[0], -1))
        return jnp.concatenate(outs, axis=1)

    def __call__(self, x_flat):
        return self.enc(x_flat)
