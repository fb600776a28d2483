"""Two-stage layer-energy cascade model.

A dense ResNet diffusion model generates the (totalE + per-layer energy)
vector first; the base U-Net then generates the shower conditioned on those
generated layer energies (reference: calodiffusion/models/layerdiffusion.py).

JAX re-design: instead of the reference's mutable ``set_layer_state`` swap of
``self.model``/``self.forward``, the two denoisers are pure functions over a
two-part parameter tree {"layer_model", "base_model"}; training toggles which
loss is computed, inference chains two jitted samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from calodiffusion_tpu.models.diffusion import CaloDiffusion
from calodiffusion_tpu.models.nn_modules import ResNetDense
from calodiffusion_tpu.utils import preprocessing


class _LayerModelView:
    """Adapter exposing the layer-energy model through the sampler protocol
    (samplers call ``model.denoise(params, x, E, sigma, layers)``)."""

    def __init__(self, parent: "LayerDiffusion"):
        self.parent = parent
        self.nsteps = parent.layer_steps
        self.loss_function = parent.loss_function
        self._data_shape = (parent.config["SHAPE_FINAL"][2] + 1,)

    def denoise(self, params, x, E=None, sigma=None, layers=None, controls=None):
        return self.parent.denoise_layer(params, x, E=E, sigma=sigma)

    def noise_generation(self, key, shape):
        return jax.random.normal(key, shape, dtype=jnp.float32)


class LayerDiffusion(CaloDiffusion):
    def __init__(self, config, n_steps: int = 400, loss_type: str = "l2"):
        super().__init__(config, n_steps, loss_type)
        self.layer_loss = False
        self.layer_sampler_name = self.config.get("LAYER_SAMPLER", "DDim")
        self.layer_steps = self.config.get("LAYER_STEPS", n_steps)
        self.shape_pad = self.config.get("SHAPE_PAD") or self.config["SHAPE_FINAL"]

        cond_size = 3 if self.hgcal else 1
        self.layer_net = ResNetDense(
            dim_in=self.config["SHAPE_FINAL"][2] + 1,
            num_layers=5,
            cond_size=cond_size,
        )

    # -- params -------------------------------------------------------------
    def init(self, key):
        k_base, k_layer = jax.random.split(key)
        base = super().init(k_base)
        n_lay = self.config["SHAPE_FINAL"][2] + 1
        n_cond = 3 if self.hgcal else 1
        layer = self.layer_net.init(
            k_layer,
            jnp.zeros((1, n_lay)), cond=jnp.zeros((1, n_cond)),
            time=jnp.zeros((1,)),
        )
        return {"base_model": base, "layer_model": layer}

    def set_layer_state(self, is_layer: bool = False):
        self.layer_loss = is_layer

    # -- per-dim whitening ---------------------------------------------------
    # The consts standardization of the layer-energy vector is a single
    # GLOBAL (mean, std) over all layers (reference utils.py preprocessing),
    # so in the diffusion space the per-dim scales range from ~0.05 (peak
    # layers, whose logit fractions barely vary) to ~1.0 (totalE).  A
    # noise schedule calibrated for unit-scale data cannot resolve the
    # 0.05-scale dims — measured on the cascade fidelity family this is
    # what drives the deep-tail layer-fraction undershoot and pushes the
    # sampled vectors off the conditioning manifold of the shower U-Net.
    # TPU-native redesign: diffuse a per-dim whitened vector instead.  The
    # stats live in params["layer_model"]["whiten"] (computed from the
    # training data by TrainLayerModel, EMA/checkpoint round-trip for
    # free); absent stats (e.g. reference-imported .pth weights,
    # tools/torch_import.py) mean identity, preserving exact parity with
    # the reference cascade.
    @staticmethod
    def _whiten_stats(params):
        w = None
        if isinstance(params, dict):
            lm = params.get("layer_model")
            if isinstance(lm, dict):
                w = lm.get("whiten")
        if w is None:
            return None
        # frozen statistics, not trainable parameters: without the
        # stop_gradient the loss-through-whitening path would let Adam
        # drift the stats to cheat the objective
        return (jax.lax.stop_gradient(jnp.asarray(w["mean"])),
                jax.lax.stop_gradient(jnp.asarray(w["std"])))

    def whiten_layers(self, params, layers):
        stats = self._whiten_stats(params)
        if stats is None:
            return layers
        mean, std = stats
        return (layers - mean) / std

    def unwhiten_layers(self, params, u):
        stats = self._whiten_stats(params)
        if stats is None:
            return u
        mean, std = stats
        return u * std + mean

    # -- denoisers ----------------------------------------------------------
    def denoise_layer(self, params, x, E=None, sigma=None):
        """Denoise in layer-energy space (reference layer_forward :109-112 +
        the shared denoise scalings, calodiffusion.py:154-169)."""
        t_emb = self.do_time_embed(jnp.reshape(sigma, (-1,)))
        scales = self.loss_function.get_scaling(sigma)
        pred = self.layer_net.apply(
            params["layer_model"], x * scales["c_in"], cond=E, time=t_emb
        )
        name = self.training_objective
        if "noise_pred" in name:
            return x - sigma * pred
        if "mean_pred" in name:
            return pred
        return scales["c_skip"] * x + scales["c_out"] * pred

    def denoise(self, params, x, E=None, sigma=None, layers=None, controls=None):
        base = params["base_model"] if isinstance(params, dict) and \
            "base_model" in params else params
        return super().denoise(base, x, E=E, sigma=sigma, layers=layers,
                               controls=controls)

    def prepare_int8(self, params, **kw):
        """int8 calibration runs on the shower U-Net only (the layer
        ResNet has no convolutions)."""
        if not self.config.get("QUANT_INT8_EXCLUDE"):
            # measured fence (docs/INT8_CASCADE.md): on the two-stage
            # cascade, DOWN-path activation quantization alone moves the
            # fidelity classifier AUC 0.70 -> 0.86 (weight quantization
            # is clean); excluding the down path restores the gate
            print(
                "WARNING: QUANT_INT8 on the layer cascade without "
                "QUANT_INT8_EXCLUDE — down-path activation quantization "
                "measurably breaks cascade fidelity (docs/INT8_CASCADE"
                ".md).  Set QUANT_INT8_EXCLUDE, e.g. the down path "
                "(ResnetBlock_0..5 + the downsample convs).", flush=True,
            )
        base = params["base_model"] if isinstance(params, dict) and \
            "base_model" in params else params
        return super().prepare_int8(base, **kw)

    def compute_loss(self, params, key, data, energy, noise=None, layers=None,
                     time=None, rnd_normal=None):
        if self.layer_loss:
            # train the layer model: the "data" is the layer-energy vector,
            # diffused in per-dim whitened space (see _whiten_stats)
            def denoise_fn(x, E=None, sigma=None, layers=None):
                return self.denoise_layer(params, x, E=E, sigma=sigma)

            target = self.whiten_layers(params, layers.astype(jnp.float32))
            return self.loss_function(
                denoise_fn, target, energy, key,
                noise=None, time=time, layers=layers, rnd_normal=rnd_normal,
            )
        def denoise_fn(x, E=None, sigma=None, layers=None):
            return self.denoise(params, x, E=E, sigma=sigma, layers=layers)

        return self.loss_function(
            denoise_fn, data, energy, key, noise=noise, time=time,
            layers=layers, rnd_normal=rnd_normal,
        )

    # -- sampling -----------------------------------------------------------
    def sample_layers(self, params, key, energy, debug=False, sample_offset=0):
        from calodiffusion_tpu.samplers import get_sampler

        sampler = get_sampler(self.layer_sampler_name)(self.config)
        view = _LayerModelView(self)
        shape = (energy.shape[0], self.shape_pad[2] + 1)
        k_start, k_samp = jax.random.split(key)
        start = jax.random.normal(k_start, shape, dtype=jnp.float32)
        out = sampler(
            view, params, start, energy, None, self.layer_steps,
            sample_offset or 0, k_samp, debug,
        )
        u = out[0] if isinstance(out, tuple) else out
        # sampler runs in whitened space; hand back consts-standardized
        # layer energies (identity when no stats — reference parity)
        return self.unwhiten_layers(params, u)

    def sample(self, params, key, energy, layers=None, num_steps=400,
               sample_offset=0, debug=False, sampler=None,
               return_layers=False):
        """Two-stage sampling; returns a dict like the reference
        (layerdiffusion.py:130-163).  With config ``QUANT_INT8`` the
        shower U-Net stage runs its convs in W8A8 int8 (ops/quant.py); the
        layer ResNet stage has no convolutions and is unaffected.

        ``layers`` (consts-standardized, the loader's training
        representation) skips stage 1 and conditions the shower U-Net on
        the given vector — the oracle-layers diagnostic that attributes a
        cascade fidelity gap between the two stages."""
        if sampler is None:
            sampler = self.make_sampler()
        k_lay, k_start, k_samp = jax.random.split(key, 3)
        if layers is not None:
            gen_layers = jnp.asarray(layers)
        else:
            gen_layers = self.sample_layers(
                params, k_lay, energy, debug=debug,
                sample_offset=sample_offset,
            )
        shape = (energy.shape[0], *self._data_shape)
        start = self.noise_generation(k_start, shape)
        with self._int8_ctx(params):
            out = sampler(
                self, params, start, energy, gen_layers, num_steps,
                sample_offset or 0, k_samp, debug,
            )
        if debug:
            x, xs, x0s = out
        else:
            x, xs, x0s = out, None, None
        result = {"x": np.asarray(x)}
        if debug:
            result["xs"] = xs
            result["x0s"] = x0s
        if return_layers:
            result["layers"] = gen_layers
        return result

    def generate(self, params, key, data_loader, sample_steps, debug=False,
                 sample_offset=0, sparse_decoding=False,
                 sparse_per_batch=False, sampler=None, oracle_layers=False):
        """Generate with model-sampled layer energies; per-batch ReverseNorm
        (reference layerdiffusion.py:165-256).

        ``oracle_layers=True`` conditions stage 2 on the loader's TRUE
        layer-energy vectors instead of stage-1 samples — a diagnostic
        that isolates the shower U-Net's conditional fidelity from the
        layer model's sampling quality."""
        c = self.config
        orig_shape = "orig" in c.get("SHOWER_EMBED", "")
        dataset_num = c.get("DATASET_NUM", 2)
        if sampler is None:
            sampler = self.make_sampler()

        NN_embed = None
        if self.pre_embed:
            from calodiffusion_tpu.utils import hgcal_utils

            NN_embed = hgcal_utils.make_pre_embed_converter(c)

        generated, energies = [], []
        for E, true_layers, d_batch in data_loader:
            key, sub = jax.random.split(key)
            E = jnp.asarray(E)
            if self.int8_sampling_enabled() and self._int8_scales is None:
                # calibrate the stage-2 U-Net's int8 scales on the REAL
                # conditioning distribution: the loader's true layer
                # vectors AND a stage-1 sample (what inference actually
                # conditions on) — synthetic N(0,1) calibration clipped
                # tail conditioning and exploded the cascade FPD
                key, k_cal = jax.random.split(key)
                m = min(32, E.shape[0])
                samp = self.sample_layers(params, k_cal, E[:m])
                true = jnp.asarray(true_layers, jnp.float32)[:m]
                self.prepare_int8(
                    params,
                    E=jnp.concatenate([E[:m], E[:m]], axis=0),
                    layers=jnp.concatenate([true, samp], axis=0),
                )
            out = self.sample(
                params, sub, E,
                layers=true_layers if oracle_layers else None,
                num_steps=sample_steps,
                debug=debug, sample_offset=sample_offset, sampler=sampler,
                return_layers=True,
            )
            gen = out["x"]
            layers_ = np.asarray(out["layers"])
            E_np = np.asarray(E)

            kwargs = dict(
                shape=c["SHAPE_FINAL"], config=c, emax=c["EMAX"],
                emin=c["EMIN"], layerE=layers_, logE=c["logE"],
                binning_file=c["BIN_FILE"], max_deposit=c["MAXDEP"],
                showerMap=c["SHOWERMAP"], dataset_num=dataset_num,
                orig_shape=orig_shape, ecut=float(c["ECUT"]),
            )
            if self.hgcal:
                from calodiffusion_tpu.utils import hgcal_utils

                gen, E_np = hgcal_utils.reverse_norm_hgcal(
                    gen, E_np, embed=self.pre_embed, NN_embed=NN_embed,
                    sparse_decoding=sparse_decoding,
                    sparse_per_batch=sparse_per_batch, **kwargs,
                )
            else:
                gen, E_np = preprocessing.reverse_norm(gen, E_np, **kwargs)
            generated.append(gen)
            energies.append(E_np)

        generated = np.concatenate(generated)
        energies = np.concatenate(energies)
        if not orig_shape:
            generated = generated.reshape(c["SHAPE_ORIG"])
        energies = np.reshape(energies, (energies.shape[0], -1))
        return generated, energies
