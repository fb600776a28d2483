"""CaloDiffusion model: conditional denoiser + diffusion plumbing.

Functional JAX re-design of the reference model API (reference:
calodiffusion/models/diffusion.py Diffusion ABC, calodiffusion.py
CaloDiffusion): parameters are explicit pytrees, ``denoise`` is a pure
function, and sampling happens inside a single jitted computation per batch
(the samplers run `lax.scan` on-device; see samplers/).

External tensor layout stays reference-compatible - showers enter/leave as
``(B, 1, Z, A, R)`` (or flat ``(B, N)`` for FCN / dataset-1 'orig' embeds) -
while everything inside the network is channels-last for the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from calodiffusion_tpu.models.converters import NNConverter
from calodiffusion_tpu.models.losses import get_loss
from calodiffusion_tpu.models.nn_modules import CondUnet, ResNetDense
from calodiffusion_tpu.utils import preprocessing
from calodiffusion_tpu.utils.config import load_config
from calodiffusion_tpu.utils.geom import GeomConverter
from calodiffusion_tpu.utils.xml_handler import XMLHandler


class CaloDiffusionNet(nn.Module):
    """The full denoiser network: optional geometry embed + U-Net (+ decode).

    __call__(x, E, t_emb, layers) -> prediction with x's layout.
    """

    unet_kwargs: Any          # dict of CondUnet kwargs (or ResNetDense kwargs)
    fully_connected: bool
    nn_embed_gc: Any          # GeomConverter for dataset-1 'NN' embeds, else None
    hgcal_converter: Any      # HGCalConverterModule or None
    layer_cond: bool
    rz_images: Any            # (R_image, Z_image) numpy (1, Z, A, R) or None
    phi_image: Any            # numpy (1, Z, A, R) or None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, E, t_emb, layers=None, controls=None):
        if self.layer_cond and layers is not None:
            E = jnp.concatenate([E, layers], axis=1)

        if self.fully_connected:
            net = ResNetDense(**self.unet_kwargs, dtype=self.dtype)
            return net(x, cond=E, time=t_emb)

        orig_shape = x.shape
        embed = None
        if self.nn_embed_gc is not None:
            embed = NNConverter(self.nn_embed_gc, dtype=jnp.float32, name="NN_embed")
            x_flat = x.reshape(x.shape[0], -1)
            x = embed.enc(x_flat)[:, :, :, :, None]  # (B, Z, A, R, 1)
        elif self.hgcal_converter is not None:
            from calodiffusion_tpu.models.hgcal_converter import (
                HGCalConverterModule,
            )

            embed = HGCalConverterModule(**self.hgcal_converter, name="NN_embed")
            # accept both (B, L, ncell) and the reference SHAPE_PAD layout
            # (B, 1, L, ncell) (reference HGCal_utils Embeder "... l n" einsum)
            x_cells = x.reshape(x.shape[0], *x.shape[-2:])
            x = embed.enc(x_cells)[..., None]  # (B, Z, A, R, 1)
        else:
            # (B, 1, Z, A, R) -> channels-last
            x = jnp.moveaxis(x, 1, -1)

        cats = [x]
        if self.rz_images is not None:
            r_img = jnp.asarray(self.rz_images[0])[..., None]
            z_img = jnp.asarray(self.rz_images[1])[..., None]
            cats += [
                jnp.broadcast_to(r_img, x.shape),
                jnp.broadcast_to(z_img, x.shape),
            ]
        if self.phi_image is not None:
            p_img = jnp.asarray(self.phi_image)[..., None]
            cats.append(jnp.broadcast_to(p_img, x.shape))
        if len(cats) > 1:
            x = jnp.concatenate(cats, axis=-1)

        out = CondUnet(**self.unet_kwargs, dtype=self.dtype)(
            x, cond=E, time=t_emb, controls=controls
        )

        if self.nn_embed_gc is not None:
            out = embed.dec(out[..., 0])
            out = out.reshape(orig_shape)
        elif self.hgcal_converter is not None:
            out = embed.dec(out[..., 0])
            out = out.reshape(orig_shape)
        else:
            out = jnp.moveaxis(out, -1, 1)
        return out


class CaloDiffusion:
    """Config-driven diffusion model (reference CaloDiffusion class parity)."""

    def __init__(self, config, n_steps: int = 400, loss_type: str = "l2"):
        self.config = load_config(config)
        c = self.config
        self.nsteps = n_steps
        self.loss_type = loss_type

        shower_embed = c.get("SHOWER_EMBED", "")
        self.pre_embed = "pre-embed" in shower_embed
        self.hgcal = c.get("HGCAL", False)
        self.fully_connected = "FCN" in shower_embed
        self.time_embed = c.get("TIME_EMBED", "sin")
        self.dataset_num = c.get("DATASET_NUM", 2)
        self.training_objective = c.get("TRAINING_OBJ", "noise_pred")
        self.layer_cond = "layer" in c.get("SHOWERMAP", "")

        self.loss_function = get_loss(self.training_objective)(
            c, self.nsteps, self.loss_type
        )
        self._int8_scales = None  # W8A8 sampling calibration (prepare_int8)

        if "orig" not in shower_embed:
            self._data_shape = tuple(c["SHAPE_PAD"][1:])
        else:
            self._data_shape = tuple(c["SHAPE_ORIG"][1:])

        # constant conditioning images over SHAPE_FINAL (channels-last (Z,A,R))
        shape_final = c["SHAPE_FINAL"][1:]
        rz_images = None
        phi_image = None
        if not self.fully_connected and c.get("R_Z_INPUT", False):
            R_image, Z_image = preprocessing.create_R_Z_image(
                dataset_num=self.dataset_num, scaled=True, shape=shape_final
            )
            rz_images = (R_image[0], Z_image[0])  # (Z, A, R)
        if not self.fully_connected and c.get("PHI_INPUT", False):
            phi_image = preprocessing.create_phi_image(shape=shape_final)[0]

        # geometry embedding
        nn_embed_gc = None
        hgcal_converter = None
        if "NN" in shower_embed and not self.hgcal:
            part = "photon" if self.dataset_num == 1 else "pion"
            bins = XMLHandler(part, c["BIN_FILE"])
            nn_embed_gc = GeomConverter(bins)
        elif self.hgcal and not self.pre_embed:
            from calodiffusion_tpu.models.hgcal_converter import (
                build_hgcal_converter_kwargs,
            )

            hgcal_converter = build_hgcal_converter_kwargs(c)

        # network sizing (reference calodiffusion.py:39-81)
        if self.fully_connected:
            unet_kwargs = dict(
                cond_emb_dim=c["COND_SIZE_UNET"],
                dim_in=c["SHAPE_ORIG"][1],
                num_layers=c["NUM_LAYERS_LINEAR"],
                hidden_dim=512,
            )
        else:
            in_channels = 1
            if c.get("R_Z_INPUT", False):
                in_channels = 3
            if c.get("PHI_INPUT", False):
                in_channels += 1
            cond_size = 2 + c["SHAPE_FINAL"][2] if self.layer_cond else 1
            if self.hgcal:
                cond_size += 2
            unet_kwargs = dict(
                cond_dim=c["COND_SIZE_UNET"],
                out_dim=1,
                channels=in_channels,
                layer_sizes=tuple(c["LAYER_SIZE_UNET"]),
                block_attn=c.get("BLOCK_ATTN", False),
                mid_attn=c.get("MID_ATTN", False),
                cylindrical=c.get("CYLINDRICAL", False),
                compress_Z=c.get("COMPRESS_Z", False),
                resnet_block_groups=c.get("BLOCK_GROUPS", 8),
                data_shape=tuple(shape_final[1:]),  # (Z, A, R)
                cond_embed=(c.get("COND_EMBED", "sin") == "sin"),
                cond_size=cond_size,
                time_embed=(c.get("TIME_EMBED", "sin") == "sin"),
                remat=c.get("REMAT", False),
            )
        self.cond_size = unet_kwargs.get("cond_size", 1)

        dtype = jnp.bfloat16 if c.get("PRECISION", "f32") == "bf16" else jnp.float32
        self.net = CaloDiffusionNet(
            unet_kwargs=unet_kwargs,
            fully_connected=self.fully_connected,
            nn_embed_gc=nn_embed_gc,
            hgcal_converter=hgcal_converter,
            layer_cond=self.layer_cond,
            rz_images=rz_images,
            phi_image=phi_image,
            dtype=dtype,
        )

    # -- cold diffusion -----------------------------------------------------
    def init_cold_diffu(self):
        """Load per-energy-bin average/std showers for cold diffusion.

        The reference references ``gen_cold_image`` without defining it
        (latent bug, reference train_diffusion.py:56); implemented here as
        in the original CaloDiffusion paper: the starting "noise" is the
        energy-binned average shower plus scaled fluctuations."""
        import h5py as h5

        loc = self.config["AVG_SHOWER_LOC"]
        with h5.File(loc, "r") as f:
            self._avg_showers = jnp.asarray(f["avg_showers"][:], jnp.float32)
            self._std_showers = jnp.asarray(f["std_showers"][:], jnp.float32)
            self._E_bins = jnp.asarray(f["E_bins"][:], jnp.float32)
        return self

    def lookup_avg_std_shower(self, E):
        idx = jnp.clip(
            jnp.searchsorted(self._E_bins, E.reshape(-1)) - 1,
            0, self._avg_showers.shape[0] - 1,
        )
        return self._avg_showers[idx], self._std_showers[idx]

    def gen_cold_image(self, E, cold_noise_scale, noise):
        avg, std = self.lookup_avg_std_shower(E)
        return avg + cold_noise_scale * noise * std

    # -- parameter management ---------------------------------------------
    def example_batch(self, batch_size: int = 1):
        x = jnp.zeros((batch_size, *self._data_shape), dtype=jnp.float32)
        n_cond = 3 if self.hgcal else 1
        E = jnp.zeros((batch_size, n_cond), dtype=jnp.float32)
        layers = None
        if self.layer_cond:
            n_lay = self.config["SHAPE_FINAL"][2] + 1
            layers = jnp.zeros((batch_size, n_lay), dtype=jnp.float32)
        return x, E, layers

    def init(self, key) -> Any:
        x, E, layers = self.example_batch(1)
        t = jnp.zeros((1,), dtype=jnp.float32)
        return self.net.init(key, x, E, t, layers)

    def embed_roundtrip(self, params, x):
        """Diagnostic: encode -> decode ``x`` (training-representation
        showers) through the model's geometry embed; identity when the
        model has none.  The rank-limited decode (GLaM pinv / GeomConverter
        NN) loses information even on REAL showers, so classifier/FPD
        between Geant and roundtripped-Geant is the fidelity ceiling any
        generative model behind this embed can reach — used by
        scripts/tpu_fidelity_families.py to attribute AUC between the
        embedding and the diffusion model."""
        net = self.net
        x = jnp.asarray(x, jnp.float32)
        if net.fully_connected or (
            net.nn_embed_gc is None and net.hgcal_converter is None
        ):
            return x
        sub = {"params": params.get("params", {}).get("NN_embed", {})}
        orig_shape = x.shape
        if net.nn_embed_gc is not None:
            conv = NNConverter(net.nn_embed_gc, dtype=jnp.float32)
            y = conv.apply(sub, x.reshape(x.shape[0], -1), method="enc")
            out = conv.apply(sub, y, method="dec")
        else:
            from calodiffusion_tpu.models.hgcal_converter import (
                HGCalConverterModule,
            )

            conv = HGCalConverterModule(**net.hgcal_converter)
            y = conv.apply(sub, x.reshape(x.shape[0], *x.shape[-2:]),
                           method="enc")
            out = conv.apply(sub, y, method="dec")
        return out.reshape(orig_shape)

    # -- diffusion math -----------------------------------------------------
    def do_time_embed(self, sigma):
        """sigma -> scalar time feature (reference calodiffusion.py:144-152)."""
        if self.time_embed == "sigma":
            return sigma / jnp.sqrt(1 + sigma**2)
        if self.time_embed in ("log", "id", "sin"):
            # 'sin'/'id' configs feed 0.5*log(sigma) through the (sinusoidal
            # or linear) time MLP; reference uses the same two formulas
            return 0.5 * jnp.log(sigma)
        raise ValueError(f"Unknown TIME_EMBED {self.time_embed}")

    def forward(self, params, x, E, time, layers=None, controls=None,
                mutable=None):
        if mutable is not None:
            return self.net.apply(params, x, E, time, layers, controls,
                                  mutable=mutable)
        return self.net.apply(params, x, E, time, layers, controls)

    def denoise(self, params, x, E=None, sigma=None, layers=None, controls=None):
        """Apply loss-specific in/skip/out scalings and convert the network
        prediction to an x0 estimate (reference calodiffusion.py:154-169)."""
        t_emb = self.do_time_embed(jnp.reshape(sigma, (-1,)))
        scales = self.loss_function.get_scaling(sigma)
        pred = self.forward(params, x * scales["c_in"], E, t_emb, layers, controls)

        name = self.training_objective
        if "noise_pred" in name:
            return x - sigma * pred
        if "mean_pred" in name:
            return pred
        if "hybrid" in name or "minsnr" in name:
            return scales["c_skip"] * x + scales["c_out"] * pred
        raise ValueError(f"??? Training obj {name}")

    def denoise_fn(self, params):
        def fn(x, E=None, sigma=None, layers=None):
            return self.denoise(params, x, E=E, sigma=sigma, layers=layers)

        return fn

    def compute_loss(
        self, params, key, data, energy, noise=None, layers=None, time=None,
        rnd_normal=None,
    ):
        return self.loss_function(
            self.denoise_fn(params), data, energy, key,
            noise=noise, time=time, layers=layers, rnd_normal=rnd_normal,
        )

    # -- sampling -----------------------------------------------------------
    def noise_generation(self, key, shape):
        return jax.random.normal(key, shape, dtype=jnp.float32)

    # -- int8 sampling (ops/quant.py) ---------------------------------------
    def int8_sampling_enabled(self) -> bool:
        from calodiffusion_tpu.ops import quant

        return bool(self.config.get("QUANT_INT8", False)) and quant.int8_allowed()

    def _int8_ctx(self, params):
        """Context manager activating int8 conv dispatch for traces opened
        inside it (no-op unless QUANT_INT8 is enabled).  Calibrates lazily
        when params are concrete; raises under jit without scales."""
        import contextlib

        from calodiffusion_tpu.ops import quant

        if not self.int8_sampling_enabled():
            return contextlib.nullcontext()
        if getattr(self, "_int8_scales", None) is None:
            leaves = jax.tree_util.tree_leaves(params)
            if leaves and isinstance(leaves[0], jax.core.Tracer):
                raise RuntimeError(
                    "QUANT_INT8 sampling inside jit needs calibrated "
                    "scales: call model.prepare_int8(params) before "
                    "tracing sample()."
                )
            self.prepare_int8(params)
        return quant.quant_scales(self._int8_scales)

    def prepare_int8(self, params, n_sigmas: int = 8, batch: int = 8,
                     key=None, E=None, layers=None, margin: float = 1.1):
        """Calibrate static per-conv activation scales for W8A8 sampling.

        Runs a handful of denoise calls on prior-like inputs across the
        discrete sigma table, recording each quantized conv's input
        abs-max (ops/quant.py).  One jitted denoise with (x, sigma) as
        arguments serves all sigmas — one compile, n_sigmas fast calls.
        Must be called with CONCRETE params (outside jit); `generate()`
        does it automatically.  Scales are cached on the model instance —
        call again after loading different params.

        ``E``/``layers``: concrete conditioning arrays from the REAL
        inference distribution (loader energies / layer vectors; for the
        cascade, stage-1 samples).  Static scales clip whatever the
        calibration never saw, so synthetic N(0,1) conditioning
        understates activation ranges when the true conditioning has
        per-dim means/scales far from unit — measured on the cascade
        family this produced rare saturated showers that exploded FPD to
        42.7 while histograms barely moved.  ``generate()`` passes the
        first batch's real conditioning automatically; ``margin``
        headroom (default 10%) covers tail inputs beyond that batch."""
        from calodiffusion_tpu.ops import quant
        from calodiffusion_tpu.samplers import schedules

        key = jax.random.PRNGKey(4321) if key is None else key
        _, E_syn, lay_syn = self.example_batch(batch)
        if E is not None:
            E = jnp.asarray(E, jnp.float32)[:64]
            batch = E.shape[0]
        else:
            kE, key = jax.random.split(key)
            E = jax.random.uniform(kE, E_syn.shape)
        if lay_syn is not None:
            if layers is not None:
                layers = jnp.asarray(layers, jnp.float32)[:batch]
                if layers.shape[0] < batch:  # tile up to the E rows
                    reps = -(-batch // layers.shape[0])
                    layers = jnp.tile(layers, (reps, 1))[:batch]
            else:
                kL, key = jax.random.split(key)
                layers = jax.random.normal(
                    kL, (batch,) + lay_syn.shape[1:]
                )
        else:
            layers = None

        sig_tab = schedules.discrete_sigmas(max(self.nsteps, 2))
        lo = max(float(sig_tab.min()), 1e-3)
        hi = float(sig_tab.max())
        shape = (batch, *self._data_shape)

        def calib_step(p, x, sigma):
            t_emb = self.do_time_embed(jnp.reshape(sigma, (-1,)))
            scales = self.loss_function.get_scaling(sigma)
            _, aux = self.forward(
                p, x * scales["c_in"], E, t_emb, layers,
                mutable=[quant.STATS_COL],
            )
            return aux

        table: dict = {}
        with quant.calibration():
            jitted = jax.jit(calib_step)
            for s in np.geomspace(lo, hi, n_sigmas):
                key, k1 = jax.random.split(key)
                x = self.noise_generation(k1, shape) * float(s)
                sigma = jnp.full((batch,) + (1,) * (len(shape) - 1),
                                 float(s))
                aux = jitted(params, x, sigma)
                table = quant.merge_stats(
                    table,
                    quant.scales_from_stats(aux.get(quant.STATS_COL, {}),
                                            margin=margin),
                )
        # QUANT_INT8_EXCLUDE: list of module-path patterns to keep in
        # high precision (a conv whose path is absent from the scales
        # table dispatches float).  Patterns match on full path-segment
        # runs (quant.path_matches) — "Conv3d_1" cannot catch Conv3d_10.
        # The per-conv fence for configs where specific quantized convs
        # measurably break fidelity — the cascade's measured table lives
        # in docs/INT8_CASCADE.md (scripts/tpu_int8_cascade_ablation.py).
        excl = self.config.get("QUANT_INT8_EXCLUDE") or []
        if excl:
            dropped = [p for p in table
                       if any(quant.path_matches(p, s) for s in excl)]
            table = {p: v for p, v in table.items() if p not in dropped}
            print(f"int8: excluding {len(dropped)} convs matching {excl}",
                  flush=True)
        self._int8_scales = table
        return table

    def make_sampler(self, sampler_name: Optional[str] = None):
        from calodiffusion_tpu.samplers import get_sampler

        name = sampler_name or self.config.get("SAMPLER", "DDim")
        return get_sampler(name)(self.config)

    def sample(
        self, params, key, energy, layers=None, num_steps: int = 400,
        sample_offset: int = 0, debug: bool = False, sampler=None,
    ):
        """Generate one batch of showers; the entire reverse trajectory runs
        inside jit (reference diffusion.py:77-104).

        Batches above ``SAMPLE_MICROBATCH`` (default 128) are processed as
        sequential microbatches via ``lax.map``: per-step activations then
        stay VMEM-resident instead of streaming through HBM, which keeps
        large-batch throughput at the batch-128 sweet spot (the round-1
        HBM cliff, BASELINE.md).

        With config ``QUANT_INT8`` the U-Net's block convolutions run in
        W8A8 int8 on the MXU (ops/quant.py); calibration happens lazily
        here when params are concrete, else call `prepare_int8` first."""
        with self._int8_ctx(params):
            return self._sample_impl(
                params, key, energy, layers, num_steps, sample_offset,
                debug, sampler,
            )

    def _sample_impl(
        self, params, key, energy, layers, num_steps,
        sample_offset, debug, sampler,
    ):
        if sampler is None:
            sampler = self.make_sampler()
        B = energy.shape[0]
        shape = (B, *self._data_shape)
        k_start, k_samp = jax.random.split(key)
        start = self.noise_generation(k_start, shape)
        if (
            self.config.get("COLD_DIFFU", False)
            and getattr(self, "_avg_showers", None) is not None
        ):
            # cold prior: start from the energy-binned average shower plus
            # scaled fluctuations instead of pure noise — the counterpart of
            # the cold training noise (trainer batch_loss); the sampler's
            # start*sigma_max scaling then matches the trained forward
            # process x_sigma = x0 + sigma * cold_noise
            start = self.gen_cold_image(
                energy[:, :1], self.config.get("COLD_NOISE", 1.0), start
            )

        micro = int(self.config.get("SAMPLE_MICROBATCH", 128) or 0)
        if not debug and micro and B > micro and B % micro == 0:
            n_chunks = B // micro
            keys = jax.random.split(k_samp, n_chunks)
            st = start.reshape(n_chunks, micro, *start.shape[1:])
            en = energy.reshape(n_chunks, micro, *energy.shape[1:])
            lay = (
                layers.reshape(n_chunks, micro, *layers.shape[1:])
                if layers is not None else None
            )

            def chunk(args):
                st_c, en_c, lay_c, k_c = args
                return sampler(
                    self, params, st_c, en_c, lay_c, num_steps,
                    sample_offset, k_c, False,
                )

            out = jax.lax.map(chunk, (st, en, lay, keys))
            return out.reshape(B, *out.shape[2:])

        return sampler(
            self, params, start, energy, layers, num_steps, sample_offset,
            k_samp, debug,
        )

    def generate(
        self, params, key, data_loader, sample_steps: int,
        debug: bool = False, sample_offset: int = 0,
        sparse_decoding: bool = False, sparse_per_batch: bool = False,
        sampler=None, roundtrip: bool = False,
    ):
        """Sample a whole dataloader and invert preprocessing
        (reference diffusion.py:118-197).

        ``roundtrip=True`` skips sampling entirely and instead passes the
        loader's OWN showers through the geometry embed's encode->decode
        (see embed_roundtrip) before the usual ReverseNorm — producing
        "generated" showers from a hypothetical perfect diffusion model,
        i.e. the embedding's fidelity ceiling."""
        c = self.config
        orig_shape = "orig" in c.get("SHOWER_EMBED", "")
        if sampler is None:
            sampler = self.make_sampler()

        if roundtrip:
            jitted_rt = jax.jit(lambda p, d: self.embed_roundtrip(p, d))
        jitted = jax.jit(
            lambda p, k, E, lay: self.sample(
                p, k, E, layers=lay, num_steps=sample_steps,
                sample_offset=sample_offset, sampler=sampler, debug=debug,
            )
        )

        import os as _os
        import time as _time

        _progress = bool(_os.environ.get("GEN_PROGRESS"))
        _t0 = _time.time()
        generated, energies, layers_all, data_batches = [], [], [], []
        for i, (E, layers_, d_batch) in enumerate(data_loader):
            key, sub = jax.random.split(key)
            E = jnp.asarray(E)
            lay = jnp.asarray(layers_) if self.layer_cond else None
            if (i == 0 and self.int8_sampling_enabled()
                    and self._int8_scales is None):
                # calibrate on the REAL conditioning distribution (see
                # prepare_int8 docstring) before the first traced sample
                self.prepare_int8(params, E=E, layers=lay)
            if roundtrip:
                out = jitted_rt(params, jnp.asarray(d_batch))
            else:
                out = jitted(params, sub, E, lay)
            if _progress:
                jax.block_until_ready(
                    out[0] if debug and not roundtrip else out
                )
                print(f"[generate] batch {i} (n={E.shape[0]}) done at "
                      f"+{_time.time()-_t0:.1f}s", flush=True)
            if debug and not roundtrip:
                x, xs, x0s = out
                data_batches.append(np.asarray(d_batch))
                if i == 0 and xs is not None:
                    self._debug_sample_plot(
                        np.asarray(xs),
                        None if x0s is None else np.asarray(x0s),
                        np.asarray(d_batch),
                    )
                out = x
            generated.append(np.asarray(out))
            energies.append(np.asarray(E))
            if self.layer_cond:
                layers_all.append(np.asarray(layers_))

        generated = np.concatenate(generated)
        energies = np.concatenate(energies)
        layers_np = np.concatenate(layers_all) if layers_all else None

        if self.hgcal:
            from calodiffusion_tpu.utils import hgcal_utils

            generated, energies = hgcal_utils.reverse_norm_hgcal(
                generated, energies,
                shape=c["SHAPE_FINAL"], config=c,
                emax=c["EMAX"], emin=c["EMIN"], layerE=layers_np,
                logE=c["logE"], binning_file=c["BIN_FILE"],
                max_deposit=c["MAXDEP"], showerMap=c["SHOWERMAP"],
                dataset_num=self.dataset_num, orig_shape=orig_shape,
                ecut=float(c["ECUT"]), embed=self.pre_embed,
                sparse_decoding=sparse_decoding,
                sparse_per_batch=sparse_per_batch,
            )
        else:
            generated, energies = preprocessing.reverse_norm(
                generated, energies,
                shape=c["SHAPE_FINAL"], config=c,
                emax=c["EMAX"], emin=c["EMIN"], layerE=layers_np,
                logE=c["logE"], binning_file=c["BIN_FILE"],
                max_deposit=c["MAXDEP"], showerMap=c["SHOWERMAP"],
                dataset_num=self.dataset_num, orig_shape=orig_shape,
                ecut=float(c["ECUT"]),
            )
        if not orig_shape:
            generated = generated.reshape(c["SHAPE_ORIG"])
        energies = np.reshape(energies, (energies.shape[0], -1))
        return generated, energies

    def _debug_sample_plot(self, xs, x0s, data_batch,
                           plot_folder: str = "./plots/"):
        """Histogram the normalized-voxel distribution at checkpoints along
        the reverse trajectory vs Geant (reference diffusion.py:199-235)."""
        import os

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(plot_folder, exist_ok=True)
        n = xs.shape[0]
        steps = sorted(set([0, n // 4, n // 2, 3 * n // 4, 9 * n // 10,
                            max(n - 10, 0), max(n - 5, 0), n - 1]))
        name = self.config.get("CHECKPOINT_NAME", "debug")
        for j in steps:
            series = [("gen", xs[j])]
            if x0s is not None:  # some samplers expose no x0 trajectory
                series.append(("x0", x0s[j]))
            for tag, arr in series:
                fig = plt.figure(figsize=(8, 6))
                plt.hist(arr.reshape(-1), bins=40, density=True,
                         histtype="step", color="blue", label="Diffu")
                plt.hist(data_batch.reshape(-1), bins=40, density=True,
                         histtype="step", color="black", label="Geant4")
                plt.xlabel("Normalized Voxel Energy")
                plt.legend()
                fig.savefig(os.path.join(
                    plot_folder, f"{name}_norm_voxels_{tag}_step{j}.png"
                ))
                plt.close(fig)

    def __call__(self, params, x, **kwargs):
        return self.denoise(params, x, **kwargs)
