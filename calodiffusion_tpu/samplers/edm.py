"""EDM-family samplers: Karras sigma ladder + churn (arXiv:2206.00364),
plus LMS and Restart (arXiv:2306.14878).

Reference semantics: calodiffusion/models/sample.py:577-954.  Per-step
scalars (t_hat, churn scale, solver coefficients, LMS quadrature weights)
are static functions of the step grid, precomputed host-side; bodies run as
``lax.scan`` with the final (t_next = 0) step traced separately so
second-order correctors never divide by zero.  (The reference's Heun/DPM2
apply their corrector at t_next=0 and NaN on the last step - a latent bug;
here the last step is a plain Euler step, the standard EDM formulation.)

Restart: the reference's restart bookkeeping is implemented as *intended*
(its class version compares int indices against str dict keys and appends
the ``next`` builtin; the legacy function form at
calodiffusion/utils/sampling.py:198-203 shows the intended int-cast
behavior, used here).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from calodiffusion_tpu.samplers import schedules
from calodiffusion_tpu.samplers.base import Sample, bshape


class EDMBase(Sample):
    def __init__(self, config):
        super().__init__(config)
        noisy = self.config.get("NOISY_SAMPLE", False)
        self.S_churn = 40 if noisy else 0
        self.S_min = self.sample_config.get("S_MIN", 0.01)
        self.S_max = 50 if noisy else 1
        self.S_noise = self.sample_config.get("S_NOISE", 1.003)
        self.sigma_min = self.sample_config.get("SIGMA_MIN", 0.002)
        self.sigma_max = self.sample_config.get("SIGMA_MAX", 80.0)
        self.orig_schedule = self.sample_config.get("ORG_SCHEDULE", False)
        self.rho = self.sample_config.get("RHO", 7)
        self.order = self.sample_config.get("ORDER", 4)
        self.restart_gamma = self.sample_config.get("RESTART_GAMMA", 0.05)
        self.C_2 = self.sample_config.get("C2", 0.0008)
        self.C_1 = self.sample_config.get("C1", 0.001)

    def t_steps(self, num_steps: int, sample_offset: int) -> np.ndarray:
        t = schedules.karras_steps(
            num_steps, self.sigma_min, self.sigma_max, self.rho
        ).astype(np.float64)
        t = np.concatenate([t, [0.0]])
        t = t[sample_offset:]
        if self.orig_schedule:
            t = schedules.iddpm_orig_steps(
                num_steps, self.sigma_min, self.sigma_max, self.C_1, self.C_2
            ).astype(np.float64)
        return t

    def churn_rows(self, t_steps: np.ndarray, num_steps: int):
        """Per-step (t_cur, t_hat, t_next, churn_scale) host-side table."""
        rows = []
        for t_cur, t_next in zip(t_steps[:-1], t_steps[1:]):
            gamma = (
                min(self.S_churn / num_steps, math.sqrt(2) - 1)
                if self.S_min <= t_cur <= self.S_max
                else 0.0
            )
            t_hat = t_cur + gamma * t_cur
            churn = math.sqrt(max(t_hat**2 - t_cur**2, 0.0)) * self.S_noise
            rows.append((t_cur, t_hat, t_next, churn))
        return rows

    def denoise_at(self, denoise, x, t, bs):
        return denoise(x, jnp.ones(bs, jnp.float32) * t)


class Euler(EDMBase):
    """EDM 1st-order (reference sample.py:771-789)."""

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        ts = self.t_steps(num_steps, sample_offset)
        rows = self.churn_rows(ts, num_steps)
        bs = bshape(start)
        x = start.astype(jnp.float32) * float(ts[0])

        tables = {
            "t_hat": jnp.asarray([r[1] for r in rows], jnp.float32),
            "t_next": jnp.asarray([r[2] for r in rows], jnp.float32),
            "churn": jnp.asarray([r[3] for r in rows], jnp.float32),
        }
        inj = self.take_noise(len(rows), start.shape)
        if inj is not None:
            tables["noise"] = inj

        def body(carry, row):
            x, k = carry
            k, kn = jax.random.split(k)
            noise = (
                row["noise"] if inj is not None
                else jax.random.normal(kn, x.shape, x.dtype)
            )
            x_hat = x + row["churn"] * noise
            den = self.denoise_at(denoise, x_hat, row["t_hat"], bs)
            d_cur = (x_hat - den) / row["t_hat"]
            x = x_hat + (row["t_next"] - row["t_hat"]) * d_cur
            out = (x, den) if debug else None
            return (x, k), out

        (x, _), traj = jax.lax.scan(body, (x, key), tables)
        if debug:
            return x, traj[0], traj[1]
        return x


class _SecondOrderEDM(EDMBase):
    """Shared scan: churn + first eval + subclass 2nd-order update; final
    step (t_next==0) is a plain Euler step traced separately."""

    def second_order_update(self, denoise, bs, x_hat, den, t_hat, t_next):
        raise NotImplementedError

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        ts = self.t_steps(num_steps, sample_offset)
        rows = self.churn_rows(ts, num_steps)
        bs = bshape(start)
        x = start.astype(jnp.float32) * float(ts[0])

        main, last = rows[:-1], rows[-1]
        tables = {
            "t_hat": jnp.asarray([r[1] for r in main], jnp.float32),
            "t_next": jnp.asarray([r[2] for r in main], jnp.float32),
            "churn": jnp.asarray([r[3] for r in main], jnp.float32),
        }
        inj = self.take_noise(len(main), start.shape)
        if inj is not None:
            tables["noise"] = inj

        def body(carry, row):
            x, k = carry
            k, kn = jax.random.split(k)
            noise = (
                row["noise"] if inj is not None
                else jax.random.normal(kn, x.shape, x.dtype)
            )
            x_hat = x + row["churn"] * noise
            den = self.denoise_at(denoise, x_hat, row["t_hat"], bs)
            x = self.second_order_update(
                denoise, bs, x_hat, den, row["t_hat"], row["t_next"]
            )
            out = (x, den) if debug else None
            return (x, k), out

        (x, key), traj = jax.lax.scan(body, (x, key), tables)

        # final step: Euler to t=0 (2nd-order corrector undefined there)
        key, kn = jax.random.split(key)
        t_cur, t_hat, t_next, churn = last
        inj_last = self.take_noise(1, start.shape)
        noise_last = (
            inj_last[0] if inj_last is not None
            else jax.random.normal(kn, x.shape, x.dtype)
        )
        x_hat = x + churn * noise_last
        den = self.denoise_at(denoise, x_hat, t_hat, bs)
        x = x_hat + (t_next - t_hat) * (x_hat - den) / t_hat
        if debug:
            # append the final Euler step so the trajectory's last frame
            # IS the returned sample (the debug plot keys on xs[-1])
            xs, x0s = traj
            xs = jnp.concatenate([xs, x[None]], axis=0)
            x0s = jnp.concatenate([x0s, den[None]], axis=0)
            return x, xs, x0s
        return x


class Heun(_SecondOrderEDM):
    """EDM 2nd-order Heun (reference sample.py:792-821, corrected)."""

    def second_order_update(self, denoise, bs, x_hat, den, t_hat, t_next):
        d_cur = (x_hat - den) / t_hat
        h = t_next - t_hat
        x_prime = x_hat + h * d_cur
        den2 = self.denoise_at(denoise, x_prime, t_next, bs)
        d_prime = (x_prime - den2) / t_next
        return x_hat + h * (0.5 * d_cur + 0.5 * d_prime)


class DPM2(_SecondOrderEDM):
    """EDM 2nd-order midpoint (reference sample.py:824-850)."""

    def second_order_update(self, denoise, bs, x_hat, den, t_hat, t_next):
        d_cur = (x_hat - den) / t_hat
        h = t_next - t_hat
        t_mid = jnp.exp(0.5 * (jnp.log(t_hat) + jnp.log(t_next)))
        x_2 = x_hat + d_cur * (t_mid - t_hat)
        den2 = self.denoise_at(denoise, x_2, t_mid, bs)
        d_2 = (x_2 - den2) / t_mid
        return x_hat + h * d_2


class LMS(EDMBase):
    """Linear multistep over the Karras grid (reference sample.py:729-768);
    quadrature coefficients precomputed with scipy host-side."""

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        ts = self.t_steps(num_steps, sample_offset)
        bs = bshape(start)
        x = start.astype(jnp.float32) * float(ts[0])

        T = len(ts) - 1
        order = self.order
        coeffs = np.zeros((T, order), dtype=np.float64)
        for i in range(T):
            cur_order = min(i + 1, order)
            for j in range(cur_order):
                coeffs[i, j] = schedules.linear_multistep_coeff(
                    cur_order, ts, i, j
                )
        tables = {
            "t": jnp.asarray(ts[:-1], jnp.float32),
            "coeffs": jnp.asarray(coeffs, jnp.float32),
        }

        buf = jnp.zeros((order, *x.shape), jnp.float32)

        def body(carry, row):
            x, buf = carry
            den = self.denoise_at(denoise, x, row["t"], bs)
            d_cur = (x - den) / row["t"]
            buf = jnp.concatenate([d_cur[None], buf[:-1]], axis=0)
            upd = jnp.tensordot(row["coeffs"], buf, axes=1)
            x = x + upd
            return (x, buf), ((x, den) if debug else None)

        (x, _), traj = jax.lax.scan(body, (x, buf), tables)
        if debug:
            return x, traj[0], traj[1]
        return x


class Restart(EDMBase):
    """Restart sampling (reference sample.py:853-954, intended semantics)."""

    def __init__(self, config):
        super().__init__(config)
        default_restart = {
            "0": [4, 1, 19.35, 40.79],
            "1": [4, 1, 1.09, 1.92],
            "2": [4, 4, 0.59, 1.09],
            "3": [4, 1, 0.30, 0.59],
            "4": [4, 4, 0.06, 0.30],
        }
        self.restart_list = self.sample_config.get("RESTART_LIST", default_restart)

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        ts = self.t_steps(num_steps, sample_offset)
        rows = self.churn_rows(ts, num_steps)
        bs = bshape(start)
        x = start.astype(jnp.float32) * float(ts[0])

        # cast t_min of each restart config to the nearest main-step index
        # (intended behavior per the legacy sampler, sampling.py:198-203).
        # Unlike the reference's dict comprehension - where two configs
        # mapping to the same index silently overwrite (last wins) - every
        # config is kept and applied in order at its index.
        restart_at: dict[int, list] = {}
        for v in self.restart_list.values():
            idx = int(np.argmin(np.abs(ts - v[2])))
            restart_at.setdefault(idx, []).append(v)

        def euler_segment(x, key, seg_rows):
            if not seg_rows:
                return x, key
            tables = {
                "t_hat": jnp.asarray([r[1] for r in seg_rows], jnp.float32),
                "t_next": jnp.asarray([r[2] for r in seg_rows], jnp.float32),
                "churn": jnp.asarray([r[3] for r in seg_rows], jnp.float32),
            }
            inj = self.take_noise(len(seg_rows), start.shape)
            if inj is not None:
                tables["noise"] = inj

            def body(carry, row):
                x, k = carry
                k, kn = jax.random.split(k)
                noise = (
                    row["noise"] if inj is not None
                    else jax.random.normal(kn, x.shape, x.dtype)
                )
                x_hat = x + row["churn"] * noise
                den = self.denoise_at(denoise, x_hat, row["t_hat"], bs)
                x = x_hat + (row["t_next"] - row["t_hat"]) * (x_hat - den) / row["t_hat"]
                return (x, k), None

            (x, key), _ = jax.lax.scan(body, (x, key), tables)
            return x, key

        # split the main Euler walk into scan segments at restart points
        seg_start = 0
        for i in range(len(rows)):
            if i + 1 in restart_at:
                x, key = euler_segment(x, key, rows[seg_start: i + 1])
                for cfg in restart_at[i + 1]:
                    x, key = self._restart_block(
                        denoise, bs, ts, x, key, i + 1, cfg
                    )
                seg_start = i + 1
        x, key = euler_segment(x, key, rows[seg_start:])
        if debug:
            return x, None, None
        return x

    def _restart_block(self, denoise, bs, ts, x, key, restart_idx, cfg):
        """One restart config: re-noise up to t_max, Heun back down to
        t_steps[restart_idx], K times (reference sample.py:871-932)."""
        n_restart, K, _t_min, t_max = cfg
        new_ts = schedules.karras_steps(
            n_restart, float(ts[restart_idx]), t_max, self.rho
        ).astype(np.float64)
        reup = math.sqrt(max(new_ts[0] ** 2 - new_ts[-1] ** 2, 0.0)) * self.S_noise

        def draw(k):
            inj = self.take_noise(1, x.shape)
            if inj is not None:
                return inj[0]
            return jax.random.normal(k, x.shape, x.dtype)

        for _ in range(int(K)):
            key, kn = jax.random.split(key)
            x = x + reup * draw(kn)
            for j, (t_cur, t_next) in enumerate(zip(new_ts[:-1], new_ts[1:])):
                gamma = (
                    self.restart_gamma
                    if self.S_min <= t_cur <= self.S_max
                    else 0.0
                )
                t_hat = t_cur + gamma * t_cur
                churn = math.sqrt(max(t_hat**2 - t_cur**2, 0.0)) * self.S_noise
                key, kn = jax.random.split(key)
                x_hat = x + churn * draw(kn)
                den = self.denoise_at(denoise, x_hat, t_hat, bs)
                d_cur = (x_hat - den) / t_hat
                x = x_hat + (t_next - t_hat) * d_cur
                if (j < len(new_ts) - 2 or new_ts[-1] != 0) and t_next > 0:
                    den2 = self.denoise_at(denoise, x, t_next, bs)
                    d_prime = (x - den2) / t_next
                    x = x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)
        return x, key
