"""Consistency and Bespoke Non-Stationary samplers.

Reference semantics: calodiffusion/models/sample.py:957-1011 (Consistency,
few-step sampling at hardcoded fractions of the consistency schedule) and
:1013-1122 (BespokeNonStationary, arXiv:2403.01329 - trainable per-step
affine solver theta[2, num_steps]).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from calodiffusion_tpu.samplers import schedules
from calodiffusion_tpu.samplers.base import Sample, bshape


class Consistency(Sample):
    def __init__(self, config):
        super().__init__(config)
        self.consis_nsteps = self.config.get("CONSIS_NSTEPS", 100)
        self.sigma_min = 0.002

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        # quirk preserved: sampling temporarily rebuilds the model's loss
        # tables at CONSIS_NSTEPS (reference :971-1010)
        orig_steps = model.nsteps
        model.loss_function.update_step(self.consis_nsteps)
        sigmas_all = schedules.discrete_sigmas(self.consis_nsteps).astype(np.float64)

        n = self.consis_nsteps
        sample_idxs = [0, round(n * 0.5), round(n * 0.7), round(n * 0.9),
                       round(n * 0.95)]
        if num_steps > 1:
            t_steps = [float(sigmas_all[i]) for i in sample_idxs[:num_steps]]
        else:
            t_steps = [float(sigmas_all[0])]
        sigmas = t_steps + [0.0]

        bs = bshape(start)
        x = start * sigmas[0]
        x0 = x
        xs, x0s = [], []
        for sigma_cur, sigma_next in zip(sigmas[:-1], sigmas[1:]):
            x0 = denoise(x, jnp.ones(bs, jnp.float32) * sigma_cur)
            sigma_next = max(sigma_next, self.sigma_min)
            if sigma_next > self.sigma_min:
                key, kn = jax.random.split(key)
                inj = self.take_noise(1, x.shape)
                noise = (
                    inj[0] if inj is not None
                    else jax.random.normal(kn, x.shape, x.dtype)
                )
                x = x0 + noise * math.sqrt(sigma_next**2 - self.sigma_min**2)
            else:
                x = x0
            if debug:
                xs.append(x)
                x0s.append(x0)

        model.loss_function.update_step(orig_steps)
        if debug:
            return x, jnp.stack(xs), jnp.stack(x0s)
        return x


class BespokeNonStationary(Sample):
    """Trainable affine per-step solver: x <- a_i x + b_i U(x)
    (reference :1013-1122)."""

    def __init__(self, config):
        super().__init__(config)
        self.theta = None

    def load_theta(self, num_steps):
        if self.theta is not None and self.theta.shape[1] == num_steps:
            return
        path = self.sample_config.get("SAMPLER_PATH")
        if path is None:
            flags = self.config.get("flags", {})
            data_folder = getattr(flags, "data_folder", None) or (
                flags.get("data_folder") if isinstance(flags, dict) else None
            )
            if data_folder:
                path = os.path.join(data_folder, "bns_sampler.npy")
        if self.sample_config.get("TRAIN_SAMPLER", False):
            raise RuntimeError(
                "theta not trained; call .train(model, params, loader, num_steps) "
                "before sampling"
            )
        if path is None or not os.path.exists(path):
            raise ValueError(
                "No sampler path provided, set it with 'SAMPLER_PATH' in the config"
            )
        self.theta = np.load(path)

    def train(self, model, params, loader, num_steps, key=None):
        """Optimize theta against the PSNR objective (reference :1066-1105)."""
        import optax

        key = key if key is not None else jax.random.PRNGKey(0)
        theta = jnp.ones((2, num_steps), jnp.float32)
        lr = self.sample_config.get("LR", 1e-3)
        max_iter = self.sample_config.get("MAX_ITER", 30)
        opt = optax.adam(lr)
        opt_state = opt.init(theta)

        def run_sampler(theta, x, energy, layers, key):
            denoise = self.make_denoise_fn(model, params, energy, layers)
            bs = bshape(x)
            for i in range(num_steps):
                key, kn = jax.random.split(key)
                sigma = jax.random.normal(kn, (x.shape[0],))
                sigma = sigma.reshape(bs)
                u = denoise(x, sigma)
                x = x * theta[0, i] + u * theta[1, i]
            return x

        def loss_fn(theta, x, energy, layers, key):
            x_prime = run_sampler(theta, x, energy, layers, key)
            mse = jnp.mean((x - x_prime) ** 2)
            max_val = jnp.max(x, axis=-1)
            psnr = 20 * jnp.log10(jnp.mean(max_val) / jnp.sqrt(mse + 1e-12))
            return psnr

        for _ in range(max_iter):
            for E, lay, d in loader:
                key, sub = jax.random.split(key)
                loss, g = jax.value_and_grad(loss_fn)(
                    theta, jnp.asarray(d), jnp.asarray(E),
                    jnp.asarray(lay) if lay is not None else None, sub,
                )
                updates, opt_state = opt.update(g, opt_state)
                theta = optax.apply_updates(theta, updates)

        self.theta = np.asarray(theta)
        path = self.sample_config.get("SAMPLER_PATH")
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.save(path, self.theta)
        return self.theta

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        self.load_theta(num_steps)
        if num_steps != self.theta.shape[1]:
            raise ValueError(
                "Number of steps must match the number of steps in the theta "
                "parameterization"
            )
        denoise = self.make_denoise_fn(model, params, energy, layers)
        bs = bshape(start)
        theta = jnp.asarray(self.theta[:, sample_offset:])
        steps = theta.shape[1]

        # per-step sigma is a fresh standard normal per the reference's
        # model_fn (:1108-1110, "Don't really care about the noise
        # schedule"); injectable for golden trajectory parity
        inj = self.take_noise(steps, (start.shape[0],))
        if inj is not None:
            sigmas = inj.reshape((steps,) + bs)
        else:
            sigmas = jax.random.normal(
                key, (steps, start.shape[0])
            ).reshape((steps,) + bs)

        def body(x, step):
            ab, sigma = step
            u = denoise(x, sigma)
            x = x * ab[0] + u * ab[1]
            return x, x

        x, xs = jax.lax.scan(body, start, (theta.T, sigmas))
        if debug:
            return x, xs, None
        return x
