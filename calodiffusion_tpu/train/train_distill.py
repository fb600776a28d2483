"""Consistency distillation: a trainer for the ``Consistency`` sampler.

The reference ships a Consistency SAMPLER (reference models/sample.py:957-
1011) but no trainer that could ever produce a model for it — the sampler
class is dead surface without one.  ``TrainDistillation`` closes that loop:
it distills a trained diffusion model (the teacher) into a student whose
``denoise(x, sigma)`` maps any point of the teacher's probability-flow ODE
trajectory straight to x0, so the existing Consistency sampler generates
production-quality showers in 1-5 U-Net evaluations instead of 400.

Method: consistency distillation (Song et al., arXiv:2303.01469) with the
improved pseudo-Huber loss and 1/(sigma_{i+1}-sigma_i) weighting of
arXiv:2310.14189.  One train step:

    i ~ U{0..N-2} over the SAME decreasing sigma grid the Consistency
        sampler uses (schedules.discrete_sigmas(CONSIS_NSTEPS), reversed to
        increasing here) — grid alignment means the sampler's noise
        re-injection sigmas are exactly points the student was trained on;
    x_{i+1} = x0 + sigma_{i+1} * eps                    (forward noising)
    xhat_i  = one Heun PF-ODE step of the TEACHER from sigma_{i+1} to
              sigma_i (2 teacher denoise evals, stop-gradient);
    target  = denoise_{EMA-student}(xhat_i, sigma_i)    (stop-gradient)
    loss    = w(i) * pseudo_huber(denoise_student(x_{i+1}, sigma_{i+1}),
                                  target)

The student keeps the model's standard EDM preconditioning (c_skip x +
c_out F): at the grid's smallest sigma c_skip ~= 1 and c_out ~= sigma_min,
so the consistency boundary condition f(x, sigma_min) ~= x holds by
construction and the distilled checkpoint stays a PLAIN CaloDiffusion
checkpoint — loadable by every existing inference/plot path and usable by
every sampler (Consistency for few-step, or any other at full step count).

The trainer reuses the parent's EMA machinery as the consistency TARGET
network (decay ``DISTILL_TARGET_DECAY``): ``load_for_inference`` already
prefers EMA weights, which for consistency models are exactly the weights
one should sample from.

Config keys (all optional): TEACHER_LOC (path to the teacher checkpoint;
or pass ``teacher_params=`` programmatically), CONSIS_NSTEPS (sigma-grid
size, shared with the sampler; default 100), DISTILL_TARGET_DECAY (EMA
decay of the target net, default 0.95), DISTILL_LOSS ("pseudo_huber"
[default] or "l2"), DISTILL_HUBER_C (pseudo-Huber constant; default
0.00054*sqrt(D) per arXiv:2310.14189), DISTILL_LR (optimizer LR override;
CD usually wants lower than the teacher's), DISTILL_IDX_DIST ("lognormal"
[default]: grid indices drawn with the discretized-lognormal importance
weights of arXiv:2310.14189 sec. 3.5, P_mean=-1.1/P_std=2.0, which
focuses training where consistency errors accumulate; or "uniform").
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from calodiffusion_tpu.parallel import mesh as mesh_lib
from calodiffusion_tpu.samplers import schedules
from calodiffusion_tpu.train import checkpoint as ckpt_io
from calodiffusion_tpu.train.trainer import TrainDiffusion


def _bshape(x):
    return (x.shape[0],) + (1,) * (x.ndim - 1)


class TrainDistillation(TrainDiffusion):
    """Distill a trained diffusion teacher into a few-step consistency
    student (see module docstring)."""

    def __init__(self, flags, config, teacher_params=None, **kw):
        config = dict(config)
        if "DISTILL_LR" in config:  # CD usually wants a lower LR than the
            config["LR"] = config["DISTILL_LR"]  # teacher's
        # the distill val metric (self-consistency gap along teacher
        # trajectories) plateaus long before sampled quality stops
        # improving (the EMA target keeps integrating), so the teacher's
        # EARLYSTOP patience must not cut distillation short; opt back in
        # with DISTILL_EARLYSTOP
        config["EARLYSTOP"] = int(
            config.get("DISTILL_EARLYSTOP", 10**9)
        )
        super().__init__(flags, config, **kw)
        self._teacher_params_arg = teacher_params

    # -- model/teacher setup -------------------------------------------------
    def _load_teacher(self):
        """Teacher param tree, or None when no teacher was configured (an
        inference-only use: the distilled checkpoint is a plain
        CaloDiffusion checkpoint, so loading it needs no teacher)."""
        if self._teacher_params_arg is not None:
            return self._teacher_params_arg
        loc = self.config.get("TEACHER_LOC") or getattr(
            self.flags, "teacher_loc", None
        )
        if not loc:
            return None
        folder = os.path.dirname(loc)
        name = os.path.basename(loc)
        for suffix in (".ckpt", ".pth"):
            name = name.removesuffix(suffix)
        arrays, host = ckpt_io.load_checkpoint(folder, name)
        # sample-quality weights: prefer the teacher's SWA/EMA params
        return ckpt_io.inference_params(arrays, host)

    def init_model(self):
        super().init_model()
        teacher = self._load_teacher()
        if teacher is not None:
            self.teacher_params = mesh_lib.replicate(self.mesh, teacher)
            # standard CD init: student starts FROM the teacher weights
            self.params = jax.tree_util.tree_map(
                jnp.copy, self.teacher_params
            )
        else:
            self.teacher_params = None
        # the EMA tree doubles as the consistency target network
        self.ema_decay = float(self.config.get("DISTILL_TARGET_DECAY", 0.95))
        self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)
        return self.model

    # -- distillation step ---------------------------------------------------
    def _sigma_grid(self):
        """Increasing sigma grid, identical (as a set) to the Consistency
        sampler's table (samplers/misc.py uses discrete_sigmas decreasing)."""
        n = int(self.config.get("CONSIS_NSTEPS", 100))
        return np.ascontiguousarray(
            schedules.discrete_sigmas(n)[::-1]
        ).astype(np.float32)

    def _distill_loss_fn(self):
        model = self.model
        grid = jnp.asarray(self._sigma_grid())        # (N,), increasing
        n = grid.shape[0]
        gaps = grid[1:] - grid[:-1]                   # (N-1,)
        loss_kind = self.config.get("DISTILL_LOSS", "pseudo_huber")
        d_elems = int(np.prod(self.config["SHAPE_PAD"][1:]))
        huber_c = float(
            self.config.get("DISTILL_HUBER_C", 0.00054 * np.sqrt(d_elems))
        )

        def elem_loss(pred, target):
            diff = pred - target
            if loss_kind == "l2":
                return diff**2
            return jnp.sqrt(diff**2 + huber_c**2) - huber_c

        def loss(p_student, p_target, p_teacher, data, E, layers, idx, noise,
                 mask=None):
            bs = _bshape(data)
            sig_next = grid[idx + 1].reshape(bs)     # higher noise
            sig_cur = grid[idx].reshape(bs)
            x_next = data + sig_next * noise

            # teacher Heun PF-ODE step sigma_{i+1} -> sigma_i
            x0_a = model.denoise(p_teacher, x_next, E, sig_next, layers)
            d_a = (x_next - x0_a) / sig_next
            x_mid = x_next + (sig_cur - sig_next) * d_a
            x0_b = model.denoise(p_teacher, x_mid, E, sig_cur, layers)
            d_b = (x_mid - x0_b) / sig_cur
            x_prev = x_next + (sig_cur - sig_next) * 0.5 * (d_a + d_b)
            x_prev = jax.lax.stop_gradient(x_prev)

            target = jax.lax.stop_gradient(
                model.denoise(p_target, x_prev, E, sig_cur, layers)
            )
            pred = model.denoise(p_student, x_next, E, sig_next, layers)

            # iCT weighting: lambda(i) = 1/(sigma_{i+1} - sigma_i)
            w = (1.0 / gaps[idx]).reshape(bs)
            vals = w * elem_loss(pred, target)
            if mask is None:
                return jnp.mean(vals)
            m = jnp.reshape(mask, bs) * jnp.ones_like(vals)
            return (vals * m).sum() / m.sum()

        return loss, n

    def _idx_logits(self, n_grid):
        """Log-probabilities over grid indices 0..N-2.  "lognormal"
        (default) = the discretized lognormal of arXiv:2310.14189 sec 3.5:
        p(i) ~ erf((ln s_{i+1}-Pm)/(sqrt2 Ps)) - erf((ln s_i-Pm)/(sqrt2 Ps)),
        P_mean=-1.1, P_std=2.0 — importance where consistency errors
        accumulate; "uniform" recovers plain CD index sampling."""
        from scipy.special import erf

        if self.config.get("DISTILL_IDX_DIST", "lognormal") == "uniform":
            return np.zeros(n_grid - 1, np.float32)
        grid = self._sigma_grid()
        pm, ps = -1.1, 2.0
        cdf = erf((np.log(grid) - pm) / (np.sqrt(2.0) * ps))
        p = np.maximum(cdf[1:] - cdf[:-1], 1e-12)
        return np.log(p / p.sum()).astype(np.float32)

    def _make_train_step(self):
        if self.teacher_params is None:
            raise ValueError(
                "TrainDistillation needs a teacher to train: set config "
                "TEACHER_LOC (or --teacher-loc) to a trained diffusion "
                "checkpoint, or pass teacher_params="
            )
        opt = self.opt
        ema_decay = self.ema_decay
        loss_fn, n_grid = self._distill_loss_fn()
        idx_logits = jnp.asarray(self._idx_logits(n_grid))

        # teacher rides as an explicit (undonated) arg so XLA keeps ONE
        # device-resident copy instead of baking constants per executable
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def _train_step(params, opt_state, ema_params, teacher, key, data,
                        E, layers):
            k_i, k_n = jax.random.split(key)
            idx = jax.random.categorical(k_i, idx_logits,
                                         shape=(data.shape[0],))
            noise = jax.random.normal(k_n, data.shape, data.dtype)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, ema_params, teacher, data, E, layers, idx, noise
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # EMA tree = consistency target network
            ema_params = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                ema_params, params,
            )
            return params, opt_state, ema_params, loss

        @jax.jit
        def _val_step(params, teacher, data, E, layers, rnd_normal, mask,
                      key):
            # deterministic index from the fixed val normals (the parent
            # loop feeds the same rnd_normal per batch every epoch); the
            # noise itself is redrawn per epoch from the loop's key — the
            # same calling convention as the parent trainer's val_step
            # (trainer.py training_loop), whose argument order this
            # override MUST match.  Target = the student itself
            # (stop-gradient): the self-consistency gap along teacher
            # trajectories, a stable convergence signal
            noise = jax.random.normal(key, data.shape, data.dtype)
            u = jax.scipy.stats.norm.cdf(rnd_normal)
            idx = jnp.clip((u * (n_grid - 1)).astype(jnp.int32), 0,
                           n_grid - 2)
            return loss_fn(params, params, teacher, data, E, layers, idx,
                           noise, mask=mask)

        def train_step(params, opt_state, ema_params, key, data, E, layers):
            return _train_step(params, opt_state, ema_params,
                               self.teacher_params, key, data, E, layers)

        def val_step(params, data, E, layers, rnd_normal, mask, key):
            return _val_step(params, self.teacher_params, data, E, layers,
                             rnd_normal, mask, key)

        return train_step, val_step
