"""In-model (optionally trainable) HGCal GLaM converter as a Flax module.

Used when ``HGCAL`` is set without "pre-embed": the U-Net sees the regular
(alpha x R) embedded grid and encode/decode run inside the jitted forward
(reference: calodiffusion/utils/HGCal_utils.py Embeder/Decoder :295-353,
HGCalConverter :517-690).  Trainable mode masks the matrices to the local
geometric neighborhood (the reference's sparsity masks).

The per-layer contractions are batched einsums over the (L, out, ncell)
matrix stack - one big MXU-friendly contraction, not a per-layer loop.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from calodiffusion_tpu.utils import hgcal_utils


class HGCalConverterModule(nn.Module):
    enc_init: Any          # numpy (L, out_dim, ncell)
    dec_init: Any          # numpy (L, ncell, out_dim)
    enc_mask: Any          # numpy bool, same shape as enc_init
    dec_mask: Any
    num_alpha_bins: int
    num_r_bins: int
    trainable: bool = False
    norm: bool = False
    embed_mean: float = 0.0
    embed_std: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        if self.trainable:
            self.enc_mat = self.param(
                "enc_mat", lambda key, sh: jnp.asarray(self.enc_init), None
            )
            self.dec_mat = self.param(
                "dec_mat", lambda key, sh: jnp.asarray(self.dec_init), None
            )
        else:
            self.enc_mat = jnp.asarray(self.enc_init)
            self.dec_mat = jnp.asarray(self.dec_init)

    def _enc_mat(self):
        m = self.enc_mat
        if self.trainable:
            m = m * jnp.asarray(self.enc_mask, m.dtype)
        return m

    def _dec_mat(self):
        m = self.dec_mat
        if self.trainable:
            m = m * jnp.asarray(self.dec_mask, m.dtype)
        return m

    def enc(self, x):
        """(B, L, ncell) -> (B, L, alpha, r)."""
        out = jnp.einsum("len,bln->ble", self._enc_mat(), x)
        out = out.reshape(
            *out.shape[:-1], self.num_alpha_bins, self.num_r_bins
        )
        if self.norm:
            out = (out - self.embed_mean) / self.embed_std
        return out

    def dec(self, x):
        """(B, L, alpha, r) -> (B, L, ncell)."""
        if self.norm:
            x = x * self.embed_std + self.embed_mean
        flat = x.reshape(*x.shape[:-2], self.num_alpha_bins * self.num_r_bins)
        return jnp.einsum("lne,ble->bln", self._dec_mat(), flat)

    def __call__(self, x):
        return self.enc(x)


def build_hgcal_converter_kwargs(config: dict) -> dict:
    """Constructor kwargs for HGCalConverterModule (the module itself must be
    instantiated inside the parent flax module's compact context so it binds
    to the parent scope)."""
    conv = hgcal_utils.HGCalConverter(
        bins=config["SHAPE_FINAL"],
        geom_file=config.get("BIN_FILE", ""),
        trainable=config.get("TRAINABLE_EMBED", False),
    )
    trainable = config.get("TRAINABLE_EMBED", False)
    # frozen converters are pre-normalized against the embed statistics
    # (reference calodiffusion.py:113-117: init(norm=pre_embed) -> norm=False
    # for the in-model path, matrices geometric)
    conv.init(norm=False, dataset_num=config.get("DATASET_NUM", 101))
    return dict(
        enc_init=conv.enc_mat,
        dec_init=conv.dec_mat,
        enc_mask=conv.enc_mask,
        dec_mask=conv.dec_mask,
        num_alpha_bins=conv.num_alpha_bins,
        num_r_bins=conv.num_r_bins,
        trainable=trainable,
    )
