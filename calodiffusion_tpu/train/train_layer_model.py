"""Layer-energy model trainer (reference:
calodiffusion/train/train_layer_model.py): swaps in LayerDiffusion and
toggles layer-model mode for training vs inference."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from calodiffusion_tpu.models.layerdiffusion import LayerDiffusion
from calodiffusion_tpu.train.trainer import TrainDiffusion


class TrainLayerModel(TrainDiffusion):
    def __init__(self, flags, config, load_data: bool = True,
                 save_model: bool = True, inference: bool = False, mesh=None):
        super().__init__(flags, config, load_data=load_data,
                         save_model=save_model, mesh=mesh)
        self.inference = inference

    def load_for_inference(self):
        """Composite loading (reference layerdiffusion.py:58-107): base-model
        weights from --model-loc (either a plain diffusion checkpoint or a
        composite one), layer-model weights from config['layer_model']."""
        import os

        from calodiffusion_tpu.train import checkpoint as ckpt_io

        if self.model is None:
            self.init_model()

        def load_params(loc):
            folder = os.path.dirname(loc)
            name = os.path.basename(loc)
            for suffix in (".ckpt", ".pth"):
                name = name.removesuffix(suffix)
            arrays, host = ckpt_io.load_checkpoint(folder, name)
            return ckpt_io.inference_params(arrays, host)

        base = load_params(self.flags.model_loc)
        if isinstance(base, dict) and "base_model" in base:
            base = base["base_model"]

        layer_loc = self.config.get("layer_model")
        if layer_loc:
            layer = load_params(layer_loc)
            layer = layer.get("layer_model", layer) if isinstance(layer, dict) \
                and "layer_model" in layer else layer
        else:
            # composite checkpoint carries both parts
            full = load_params(self.flags.model_loc)
            if not (isinstance(full, dict) and "layer_model" in full):
                raise ValueError(
                    "No layer model: set config['layer_model'] or use a "
                    "composite checkpoint"
                )
            layer = full["layer_model"]

        self.params = {"base_model": base, "layer_model": layer}
        return self.model, self.params

    def init_model(self):
        self.model = LayerDiffusion(
            self.config, n_steps=self.config["NSTEPS"],
            loss_type=self.config["LOSS_TYPE"],
        )
        # training trains ONLY the layer model; inference uses the cascade
        self.model.set_layer_state(not self.inference)
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(k)
        if not self.inference and self.loader_train is not None:
            self.params = dict(self.params)
            self.params["layer_model"] = dict(self.params["layer_model"])
            self.params["layer_model"]["whiten"] = self._layer_whiten_stats()
        self._init_aux_params()
        return self.model

    def _layer_whiten_stats(self):
        """Per-dim (mean, std) of the training layer-energy vectors, for
        whitened-space diffusion (LayerDiffusion._whiten_stats).  One numpy
        pass over the loader; std floored so near-constant dims don't blow
        up the unwhitened noise."""
        import numpy as np

        s0, s1, s2 = 0, None, None
        for _, layers, _ in self.loader_train:
            lay = np.asarray(layers, dtype=np.float64)
            s0 += lay.shape[0]
            s1 = lay.sum(0) if s1 is None else s1 + lay.sum(0)
            s2 = (lay ** 2).sum(0) if s2 is None else s2 + (lay ** 2).sum(0)
        mean = s1 / s0
        var = np.maximum(s2 / s0 - mean ** 2, 0.0)
        std = np.maximum(np.sqrt(var), 1e-3)
        return {
            "mean": jnp.asarray(mean, dtype=jnp.float32),
            "std": jnp.asarray(std, dtype=jnp.float32),
        }
