"""DDIM / DDPM ancestral samplers as a single on-device scan.

Reference semantics: calodiffusion/models/sample.py:29-121 (DDim with
eta=0, DDPM = eta=1), cosine discrete schedule.  All per-step coefficients
are precomputed host-side; the 400-step reverse loop is one ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from calodiffusion_tpu.samplers import schedules
from calodiffusion_tpu.samplers.base import Sample, bshape


class DDim(Sample):
    ddim_eta = 0.0

    def _step_tables(self, num_steps: int, sample_offset: int):
        t = schedules.ddpm_tables(num_steps)
        acp = t["alphas_cumprod"].astype(np.float64)
        acp_prev = t["alphas_cumprod_prev"].astype(np.float64)
        sa = t["sqrt_alphas_cumprod"].astype(np.float64)
        s1m = t["sqrt_one_minus_alphas_cumprod"].astype(np.float64)

        steps = np.arange(num_steps)[::-1]
        if sample_offset > 0:
            steps = steps[sample_offset:]

        sigma = s1m[steps] / sa[steps]
        alpha = acp[steps]
        alpha_prev = acp_prev[steps]
        denom = sa[np.maximum(steps - 1, 0)]
        ddim_sigma = self.ddim_eta * (
            ((1 - alpha_prev) / (1 - alpha)) * (1 - alpha / alpha_prev)
        ) ** 0.5
        num = np.sqrt(1.0 - alpha_prev - ddim_sigma**2)
        sigma_prev = num / denom
        mask = (steps > 0).astype(np.float64)
        return {
            "sigma": sigma.astype(np.float32),
            "sigma_prev": sigma_prev.astype(np.float32),
            "noise_coeff": (ddim_sigma / denom).astype(np.float32),
            "mask": mask.astype(np.float32),
        }

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        tabs = self._step_tables(num_steps, sample_offset)
        tables = {k: jnp.asarray(v) for k, v in tabs.items()}
        bs = bshape(start)

        x = start * tables["sigma"][0]
        stochastic = self.ddim_eta != 0.0
        inj = (
            self.take_noise(len(tabs["sigma"]), start.shape)
            if stochastic
            else None
        )
        if inj is not None:
            tables["noise"] = inj

        def body(carry, row):
            x, k = carry
            k, kn = jax.random.split(k)
            sigma_b = jnp.full(bs, row["sigma"])
            x0_pred = denoise(x, sigma_b)
            noise_pred = (x - x0_pred) / sigma_b
            step = x0_pred + row["mask"] * row["sigma_prev"] * noise_pred
            if stochastic:
                noise = (
                    row["noise"]
                    if inj is not None
                    else jax.random.normal(kn, x.shape, dtype=x.dtype)
                )
                step = step + row["noise_coeff"] * noise
            out = (step, x0_pred) if debug else None
            return (step, k), out

        (x, _), traj = jax.lax.scan(body, (x, key), tables)
        if debug:
            return x, traj[0], traj[1]
        return x


class DDPM(DDim):
    ddim_eta = 1.0
