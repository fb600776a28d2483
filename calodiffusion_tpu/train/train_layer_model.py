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

    def init_model(self):
        self.model = LayerDiffusion(
            self.config, n_steps=self.config["NSTEPS"],
            loss_type=self.config["LOSS_TYPE"],
        )
        # training trains ONLY the layer model; inference uses the cascade
        self.model.set_layer_state(not self.inference)
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(k)
        self.ema_decay = float(self.config.get("EMA_DECAY", 0.0))
        if self.ema_decay > 0:
            self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)
        return self.model
