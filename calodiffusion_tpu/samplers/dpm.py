"""DPM-Solver family (fast / adaptive) and DPM-Solver++ variants.

Reference semantics: calodiffusion/models/sample.py:124-574 and
calodiffusion/utils/sampling.py:385-600 (DPMSolver), arXiv:2206.00927 /
2211.01095.

TPU mapping:
- ``DPM`` (solver-fast): uniform order-3 segments run as a ``lax.scan``
  (3 network evals per segment); the 1-2 tail segments are traced inline.
- ``DPMAdaptive``: data-dependent step control -> ``lax.while_loop`` with
  the PID state (h, error history) in the carry.  The reference's
  ``PIDStepSizeControl`` never actually updates h (latent bug,
  sampling.py:1281-1290); here the full k-diffusion PID controller is
  implemented as intended.
- DPM++ fixed-step samplers: all per-step coefficients are scalar functions
  of the (static) sigma ladder, precomputed host-side in f64 numpy, so each
  scan body is just fused multiply-adds around the network eval.
- SDE variants replace the torchsde Brownian tree with per-interval
  standard-normal draws from split PRNG keys: ``BrownianTreeNoiseSampler``
  output is marginally N(0, I) per interval, which is the property these
  samplers use.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from calodiffusion_tpu.samplers import schedules
from calodiffusion_tpu.samplers.base import Sample, bshape


def _ancestral_np(sigma_from, sigma_to, eta):
    if not eta:
        return float(sigma_to), 0.0
    if sigma_from <= 0:
        return float(sigma_to), 0.0
    sigma_up = min(
        float(sigma_to),
        eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return float(sigma_down), float(sigma_up)


class DPM(Sample):
    """DPM-Solver-Fast (fixed step size; reference sample.py:124-185)."""

    def __init__(self, config):
        super().__init__(config)
        self.eta = self.sample_config.get("ETA", 0)
        self.s_noise = self.sample_config.get("S_NOISE", 1.0)

    def create_sigmas(self, model, num_steps):
        # quirk preserved: selecting a different num_steps rebuilds the
        # model's loss tables (reference sample.py:155-162)
        if model.nsteps != num_steps:
            model.loss_function.update_step(num_steps)
        return schedules.discrete_sigmas(num_steps)

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        sigmas = self.create_sigmas(model, num_steps).astype(np.float64)
        sigma_min, sigma_max = sigmas[-1], sigmas[0]
        if sigma_min <= 0 or sigma_max <= 0:
            raise ValueError("sigma_min and sigma_max must not be 0")

        x = start * float(sigmas[0])
        bs = bshape(start)

        t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
        nfe = num_steps
        m = math.floor(nfe / 3) + 1
        ts = np.linspace(t_start, t_end, m + 1)
        if nfe % 3 == 0:
            orders = [3] * (m - 2) + [2, 1]
        else:
            orders = [3] * (m - 1) + [nfe % 3]

        def sig(t):
            return math.exp(-t)

        def eval_d(x, t):
            sigma_b = jnp.full(bs, sig(t), dtype=jnp.float32)
            d = denoise(x, sigma_b)
            return (x - d) / sig(t)

        def solver_1(x, t, t_next, eps):
            return x - sig(t_next) * math.expm1(t_next - t) * eps

        def solver_2(x, t, t_next, eps, r1=0.5):
            h = t_next - t
            s1 = t + r1 * h
            u1 = x - sig(s1) * math.expm1(r1 * h) * eps
            eps_r1 = eval_d(u1, s1)
            return (
                x
                - sig(t_next) * math.expm1(h) * eps
                - sig(t_next) / (2 * r1) * math.expm1(h) * (eps_r1 - eps)
            )

        def solver_3(x, t, t_next, eps, r1=1 / 3, r2=2 / 3):
            h = t_next - t
            s1, s2 = t + r1 * h, t + r2 * h
            u1 = x - sig(s1) * math.expm1(r1 * h) * eps
            eps_r1 = eval_d(u1, s1)
            u2 = (
                x
                - sig(s2) * math.expm1(r2 * h) * eps
                - sig(s2) * (r2 / r1) * (math.expm1(r2 * h) / (r2 * h) - 1)
                * (eps_r1 - eps)
            )
            eps_r2 = eval_d(u2, s2)
            return (
                x
                - sig(t_next) * math.expm1(h) * eps
                - sig(t_next) / r2 * (math.expm1(h) / h - 1) * (eps_r2 - eps)
            )

        # ancestral adjustment per segment (static scalars)
        def seg_targets(t, t_next):
            if self.eta:
                sd, _ = _ancestral_np(sig(t), sig(t_next), self.eta)
                t_next_ = min(t_end, -math.log(sd))
                su = (sig(t_next) ** 2 - sig(t_next_) ** 2) ** 0.5
            else:
                t_next_, su = t_next, 0.0
            return t_next_, su

        # scan over the uniform order-3 prefix
        n3 = sum(1 for o in orders if o == 3)
        if n3 > 1:
            rows = []
            for i in range(n3):
                t, t_next = ts[i], ts[i + 1]
                t_next_, su = seg_targets(t, t_next)
                rows.append((t, t_next_, su))
            rows = {k: jnp.asarray(np.array([r[j] for r in rows]), dtype=jnp.float32)
                    for j, k in enumerate(("t", "t_next", "su"))}

            def body(carry, row):
                x, k = carry
                k, kn = jax.random.split(k)
                t = row["t"]
                t_next = row["t_next"]
                h = t_next - t

                def sigj(tt):
                    return jnp.exp(-tt)

                sigma_b = jnp.ones(bs, jnp.float32) * sigj(t)
                d0 = denoise(x, sigma_b)
                eps = (x - d0) / sigj(t)
                r1, r2 = 1 / 3, 2 / 3
                s1, s2 = t + r1 * h, t + r2 * h
                u1 = x - sigj(s1) * jnp.expm1(r1 * h) * eps
                d1 = denoise(u1, jnp.ones(bs, jnp.float32) * sigj(s1))
                eps_r1 = (u1 - d1) / sigj(s1)
                u2 = (
                    x
                    - sigj(s2) * jnp.expm1(r2 * h) * eps
                    - sigj(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1)
                    * (eps_r1 - eps)
                )
                d2 = denoise(u2, jnp.ones(bs, jnp.float32) * sigj(s2))
                eps_r2 = (u2 - d2) / sigj(s2)
                x = (
                    x
                    - sigj(t_next) * jnp.expm1(h) * eps
                    - sigj(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps)
                )
                noise = jax.random.normal(kn, x.shape, dtype=x.dtype)
                x = x + row["su"] * self.s_noise * noise
                return (x, k), (x if debug else None)

            (x, key), seg_traj = jax.lax.scan(body, (x, key), rows)
            start_idx = n3
            seg_xs = [seg_traj[i] for i in range(n3)] if debug else []
        else:
            start_idx = 0
            seg_xs = []

        # remaining segments (small, traced inline)
        for i in range(start_idx, len(orders)):
            t, t_next = ts[i], ts[i + 1]
            t_next_, su = seg_targets(t, t_next)
            eps = eval_d(x, t)
            if orders[i] == 1:
                x = solver_1(x, t, t_next_, eps)
            elif orders[i] == 2:
                x = solver_2(x, t, t_next_, eps)
            else:
                x = solver_3(x, t, t_next_, eps)
            if su:
                key, kn = jax.random.split(key)
                x = x + su * self.s_noise * jax.random.normal(
                    kn, x.shape, dtype=x.dtype
                )
            if debug:
                seg_xs.append(x)

        if debug:
            # per-SEGMENT states (this solver steps in multi-eval segments,
            # not single sigma steps)
            return x, jnp.stack(seg_xs) if seg_xs else None, None
        return x


class DPMAdaptive(DPM):
    """DPM-Solver-12/23 with PID step-size control (reference :188-308)."""

    def __init__(self, config):
        super().__init__(config)
        self.order = self.sample_config.get("ORDER", 3)
        self.r_tol = self.sample_config.get("R_TOL", 0.05)
        self.a_tol = self.sample_config.get("A_TOL", 0.0078)
        self.h_init = self.sample_config.get("H_INIT", 0.05)
        self.t_err = self.sample_config.get("T_ERROR", 1e-5)
        self.accept_safety = self.sample_config.get("ACCEPT_SAFETY", 0.81)
        self.pcoeff = self.sample_config.get("P_COEFF", 0.0)
        self.icoeff = self.sample_config.get("I_COEFF", 1.0)
        self.dcoeff = self.sample_config.get("D_COEFF", 0.0)

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        if self.order not in (2, 3):
            raise ValueError("order should be 2 or 3")
        denoise = self.make_denoise_fn(model, params, energy, layers)
        sigmas = self.create_sigmas(model, num_steps).astype(np.float64)
        sigma_min, sigma_max = float(sigmas[-1]), float(sigmas[0])
        if sigma_min <= 0 or sigma_max <= 0:
            raise ValueError("sigma_min and sigma_max must not be 0")

        t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
        bs = bshape(start)
        x = start * sigma_max

        pid_order = 1.5 if self.eta else self.order
        b1 = (self.pcoeff + self.icoeff + self.dcoeff) / pid_order
        b2 = -(self.pcoeff + 2 * self.dcoeff) / pid_order
        b3 = self.dcoeff / pid_order

        def sigj(t):
            return jnp.exp(-t)

        def eval_eps(x, t):
            sigma_b = jnp.ones(bs, jnp.float32) * sigj(t)
            return (x - denoise(x, sigma_b)) / sigj(t)

        def solver_1(x, t, t_next, eps):
            return x - sigj(t_next) * jnp.expm1(t_next - t) * eps

        def solver_2(x, t, t_next, eps, r1):
            h = t_next - t
            s1 = t + r1 * h
            u1 = x - sigj(s1) * jnp.expm1(r1 * h) * eps
            eps_r1 = eval_eps(u1, s1)
            x2 = (
                x
                - sigj(t_next) * jnp.expm1(h) * eps
                - sigj(t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps)
            )
            return x2, eps_r1

        def solver_3(x, t, t_next, eps, eps_r1, r1, r2):
            h = t_next - t
            s2 = t + r2 * h
            u2 = (
                x
                - sigj(s2) * jnp.expm1(r2 * h) * eps
                - sigj(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1)
                * (eps_r1 - eps)
            )
            eps_r2 = eval_eps(u2, s2)
            return (
                x
                - sigj(t_next) * jnp.expm1(h) * eps
                - sigj(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps)
            )

        def cond(carry):
            _, _, s, _, _, _ = carry
            return s < t_end - self.t_err

        def body(carry):
            x, x_prev, s, h, errs, k = carry
            k, kn = jax.random.split(k)
            t = jnp.minimum(t_end, s + h)

            if self.eta:
                sig_s, sig_t = sigj(s), sigj(t)
                su0 = jnp.minimum(
                    sig_t,
                    self.eta
                    * (sig_t**2 * (sig_s**2 - sig_t**2) / sig_s**2) ** 0.5,
                )
                sd = (sig_t**2 - su0**2) ** 0.5
                t_ = jnp.minimum(t_end, -jnp.log(sd))
                su = (sig_t**2 - sigj(t_) ** 2) ** 0.5
            else:
                t_, su = t, 0.0

            eps = eval_eps(x, s)
            if self.order == 2:
                x_low = solver_1(x, s, t_, eps)
                x_high, _ = solver_2(x, s, t_, eps, r1=0.5)
            else:
                x_low, eps_r1 = solver_2(x, s, t_, eps, r1=1 / 3)
                x_high = solver_3(x, s, t_, eps, eps_r1, r1=1 / 3, r2=2 / 3)

            delta = jnp.maximum(
                self.a_tol, self.r_tol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev))
            )
            error = jnp.sqrt(jnp.mean(((x_low - x_high) / delta) ** 2))

            # k-diffusion PID step controller
            inv_err = 1.0 / (error + 1e-8)
            errs0 = inv_err
            factor_raw = errs0**b1 * errs[0] ** b2 * errs[1] ** b3
            factor = 1 + jnp.arctan(factor_raw - 1)
            accept = factor >= self.accept_safety
            new_errs = jnp.where(
                accept, jnp.stack([errs0, errs[0]]), errs
            )
            h_new = h * factor

            noise = jax.random.normal(kn, x.shape, dtype=x.dtype)
            x_acc = x_high + su * self.s_noise * noise
            x_out = jnp.where(accept, x_acc, x)
            x_prev_out = jnp.where(accept, x_low, x_prev)
            s_out = jnp.where(accept, t, s)
            return (x_out, x_prev_out, s_out, h_new, new_errs, k)

        init_errs = jnp.ones((2,), jnp.float32)
        carry = (x, x, jnp.float32(t_start), jnp.float32(abs(self.h_init)),
                 init_errs, key)
        x, *_ = jax.lax.while_loop(cond, body, carry)
        if debug:
            return x, None, None
        return x


class DPMPP2S(DPM):
    """DPM-Solver++(2S) ancestral (reference sample.py:311-344)."""

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        sigmas = self.create_sigmas(model, num_steps).astype(np.float64)
        bs = bshape(start)
        x = start * float(sigmas[0])

        rows = []
        for i in range(len(sigmas) - 1):
            si = float(sigmas[i])
            sd, su = _ancestral_np(si, float(sigmas[i + 1]), self.eta)
            sig_mid = math.sqrt(si * sd)  # sigma(s) at the midpoint in lambda
            rows.append(
                dict(
                    sigma=si,
                    sig_mid=sig_mid,
                    c_x2_x=sig_mid / si,
                    c_x2_d=1.0 - math.sqrt(sd / si) if sd > 0 else 1.0,
                    c_x_x=sd / si,
                    c_x_d=1.0 - sd / si,
                )
            )
        tables = {
            k: jnp.asarray(np.array([r[k] for r in rows]), jnp.float32)
            for k in rows[0]
        }

        def body(carry, row):
            x, k = carry
            d0 = denoise(x, jnp.ones(bs, jnp.float32) * row["sigma"])
            x2 = row["c_x2_x"] * x + row["c_x2_d"] * d0
            d1 = denoise(x2, jnp.ones(bs, jnp.float32) * row["sig_mid"])
            x = row["c_x_x"] * x + row["c_x_d"] * d1
            return (x, k), ((x, d0) if debug else None)

        (x, _), traj = jax.lax.scan(body, (x, key), tables)

        # quirk preserved: the reference adds the ancestral noise once, after
        # the loop, using the last interval (reference :336-343)
        _, su_last = _ancestral_np(
            float(sigmas[-2]), float(sigmas[-1]), self.eta
        )
        if float(sigmas[-1]) > 0 and su_last > 0:
            key, kn = jax.random.split(key)
            x = x + jax.random.normal(kn, x.shape, x.dtype) * self.s_noise * su_last
        if debug:
            # last frame = the returned sample: the post-loop ancestral
            # noise (above) is part of the output the debug plot keys on
            xs = traj[0].at[-1].set(x)
            return x, xs, traj[1]
        return x


class DPMPPSDE(DPM):
    """DPM-Solver++ (stochastic) (reference :347-412)."""

    def __init__(self, config):
        super().__init__(config)
        self.r = self.sample_config.get("R", 0.5)

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        sigmas = self.create_sigmas(model, num_steps).astype(np.float64)
        bs = bshape(start)
        x = start * float(sigmas[0])
        r, fac = self.r, 1 / (2 * self.r)

        rows = []
        for i in range(len(sigmas) - 1):
            si, sn = float(sigmas[i]), float(sigmas[i + 1])
            t, t_next = -math.log(si), -math.log(sn)
            h = t_next - t
            s = t + h * r
            sig_s = math.exp(-s)
            sd1, su1 = _ancestral_np(si, sig_s, self.eta)
            sd2, su2 = _ancestral_np(si, sn, self.eta)
            rows.append(
                dict(
                    sigma=si,
                    sig_s=sig_s,
                    c1_x=sd1 / si,
                    c1_d=1.0 - sd1 / si,
                    su1=su1,
                    c2_x=sd2 / si,
                    c2_d=1.0 - sd2 / si,
                    su2=su2,
                )
            )
        tables = {
            k: jnp.asarray(np.array([rr[k] for rr in rows]), jnp.float32)
            for k in rows[0]
        }
        # injected-noise parity: the reference draws from its Brownian
        # sampler twice per step, after each half-step (sample.py:369-412),
        # regardless of eta
        inj = self.take_noise(2 * len(rows), start.shape)
        if inj is not None:
            tables["noise1"], tables["noise2"] = inj[0::2], inj[1::2]

        def body(carry, row):
            x, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            d0 = denoise(x, jnp.ones(bs, jnp.float32) * row["sigma"])
            x2 = row["c1_x"] * x + row["c1_d"] * d0
            n1 = (row["noise1"] if inj is not None
                  else jax.random.normal(k1, x.shape, x.dtype))
            x2 = x2 + n1 * self.s_noise * row["su1"]
            d1 = denoise(x2, jnp.ones(bs, jnp.float32) * row["sig_s"])
            dd = (1 - fac) * d0 + fac * d1
            x = row["c2_x"] * x + row["c2_d"] * dd
            n2 = (row["noise2"] if inj is not None
                  else jax.random.normal(k2, x.shape, x.dtype))
            x = x + n2 * self.s_noise * row["su2"]
            return (x, k), None

        (x, _), _ = jax.lax.scan(body, (x, key), tables)
        if debug:
            return x, None, None
        return x


class DPMPP2M(DPM):
    """DPM-Solver++(2M) multistep (reference :415-449)."""

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        sigmas = self.create_sigmas(model, num_steps).astype(np.float64)
        bs = bshape(start)
        x = start * float(sigmas[0])

        rows = []
        for i in range(len(sigmas) - 1):
            si, sn = float(sigmas[i]), float(sigmas[i + 1])
            t, t_next = -math.log(si), -math.log(sn) if sn > 0 else float("inf")
            h = t_next - t
            use_ms = 1.0 if (i > 0 and sn != 0) else 0.0
            if i > 0:
                h_last = t - (-math.log(float(sigmas[i - 1])))
                rr = h_last / h if h not in (0.0, float("inf")) else 0.0
            else:
                rr = 0.0
            c_x = sn / si
            c_d = 1.0 - sn / si  # = -expm1(-h)
            w_new = (1 + 1 / (2 * rr)) if use_ms else 1.0
            w_old = (1 / (2 * rr)) if use_ms else 0.0
            rows.append(dict(sigma=si, c_x=c_x, c_d=c_d, w_new=w_new, w_old=w_old))
        tables = {
            k: jnp.asarray(np.array([rr[k] for rr in rows]), jnp.float32)
            for k in rows[0]
        }

        def body(carry, row):
            x, old_d = carry
            d0 = denoise(x, jnp.ones(bs, jnp.float32) * row["sigma"])
            dd = row["w_new"] * d0 - row["w_old"] * old_d
            x = row["c_x"] * x + row["c_d"] * dd
            return (x, d0), ((x, d0) if debug else None)

        (x, _), traj = jax.lax.scan(body, (x, jnp.zeros_like(x)), tables)
        if debug:
            return x, traj[0], traj[1]
        return x


class DPMPP2MSDE(DPM):
    """DPM-Solver++(2M) SDE (reference :452-516)."""

    def __init__(self, config):
        super().__init__(config)
        self.solver_type = self.sample_config.get("SOLVER", "heun")
        if self.solver_type not in {"heun", "midpoint"}:
            raise ValueError("'SOLVER' must be 'heun' or 'midpoint'")

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        sigmas = self.create_sigmas(model, num_steps).astype(np.float64)
        bs = bshape(start)
        x = start * float(sigmas[0])

        rows = []
        h_prev = None
        for i in range(len(sigmas) - 1):
            si, sn = float(sigmas[i]), float(sigmas[i + 1])
            if sn == 0:
                rows.append(dict(sigma=si, c_x=0.0, c_d=1.0, w_corr=0.0,
                                 noise_c=0.0, denoise_only=1.0))
                continue
            t, s = -math.log(si), -math.log(sn)
            h = s - t
            eta_h = self.eta * h
            c_x = sn / si * math.exp(-eta_h)
            c_d = -math.expm1(-h - eta_h)
            if h_prev is not None:
                rr = h_prev / h
                if self.solver_type == "heun":
                    w_corr = (-math.expm1(-h - eta_h) / (-h - eta_h) + 1) * (1 / rr)
                else:
                    w_corr = 0.5 * (-math.expm1(-h - eta_h)) * (1 / rr)
            else:
                w_corr = 0.0
            noise_c = (
                sn * math.sqrt(-math.expm1(-2 * eta_h)) * self.s_noise
                if self.eta
                else 0.0
            )
            rows.append(dict(sigma=si, c_x=c_x, c_d=c_d, w_corr=w_corr,
                             noise_c=noise_c, denoise_only=0.0))
            h_prev = h
        tables = {
            k: jnp.asarray(np.array([rr[k] for rr in rows]), jnp.float32)
            for k in rows[0]
        }
        # injected-noise parity: the reference draws only when eta is
        # truthy and sigma_next != 0 (sample.py:505-512)
        inj = None
        if self.eta:
            live = [i for i, rr in enumerate(rows) if not rr["denoise_only"]]
            drawn = self.take_noise(len(live), start.shape)
            if drawn is not None:
                inj = np.zeros((len(rows), *start.shape), np.float32)
                inj[live] = np.asarray(drawn)
                tables["noise"] = jnp.asarray(inj)

        def body(carry, row):
            x, old_d, k = carry
            k, kn = jax.random.split(k)
            d0 = denoise(x, jnp.ones(bs, jnp.float32) * row["sigma"])
            x_new = row["c_x"] * x + row["c_d"] * d0
            x_new = x_new + row["w_corr"] * (d0 - old_d)
            noise = (row["noise"] if inj is not None
                     else jax.random.normal(kn, x.shape, x.dtype))
            x_new = x_new + row["noise_c"] * noise
            x = jnp.where(row["denoise_only"] > 0, d0, x_new)
            return (x, d0, k), None

        (x, _, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x), key), tables)
        if debug:
            return x, None, None
        return x


class DPMPP3MSDE(DPM):
    """DPM-Solver++(3M) SDE (reference :519-574)."""

    def __call__(
        self, model, params, start, energy, layers, num_steps, sample_offset,
        key, debug=False,
    ):
        denoise = self.make_denoise_fn(model, params, energy, layers)
        sigmas = self.create_sigmas(model, num_steps).astype(np.float64)
        bs = bshape(start)
        x = start * float(sigmas[0])

        rows = []
        h1 = h2 = None
        for i in range(len(sigmas) - 1):
            si, sn = float(sigmas[i]), float(sigmas[i + 1])
            if sn == 0:
                rows.append(dict(sigma=si, c_x=0.0, c_d=1.0, w_d1=0.0, w_d2=0.0,
                                 r0=1.0, r1=1.0, noise_c=0.0, denoise_only=1.0,
                                 mode=0.0))
                continue
            t, s = -math.log(si), -math.log(sn)
            h = s - t
            h_eta = h * (self.eta + 1)
            c_x = math.exp(-h_eta)
            c_d = -math.expm1(-h_eta)
            phi_2 = math.expm1(-h_eta) / h_eta + 1
            phi_3 = phi_2 / h_eta - 0.5
            if h2 is not None:
                mode, r0, r1 = 2.0, h1 / h, h2 / h
                w_d1, w_d2 = phi_2, phi_3
            elif h1 is not None:
                mode, r0, r1 = 1.0, h1 / h, 1.0
                w_d1, w_d2 = phi_2, 0.0
            else:
                mode, r0, r1 = 0.0, 1.0, 1.0
                w_d1 = w_d2 = 0.0
            noise_c = (
                sn * math.sqrt(-math.expm1(-2 * h * self.eta)) * self.s_noise
                if self.eta
                else 0.0
            )
            rows.append(dict(sigma=si, c_x=c_x, c_d=c_d, w_d1=w_d1, w_d2=w_d2,
                             r0=r0, r1=r1, noise_c=noise_c, denoise_only=0.0,
                             mode=mode))
            h2, h1 = h1, h
        tables = {
            k: jnp.asarray(np.array([rr[k] for rr in rows]), jnp.float32)
            for k in rows[0]
        }
        # injected-noise parity: the reference draws once per step with
        # sigma_next != 0, regardless of eta (sample.py:565-571)
        inj = None
        live = [i for i, rr in enumerate(rows) if not rr["denoise_only"]]
        drawn = self.take_noise(len(live), start.shape)
        if drawn is not None:
            inj = np.zeros((len(rows), *start.shape), np.float32)
            inj[live] = np.asarray(drawn)
            tables["noise"] = jnp.asarray(inj)

        def body(carry, row):
            x, d_1, d_2, k = carry
            k, kn = jax.random.split(k)
            d0 = denoise(x, jnp.ones(bs, jnp.float32) * row["sigma"])
            x_new = row["c_x"] * x + row["c_d"] * d0

            d1_0 = (d0 - d_1) * (1.0 / row["r0"])
            d1_1 = (d_1 - d_2) * (1.0 / row["r1"])
            d1 = d1_0 + (d1_0 - d1_1) * row["r0"] / (row["r0"] + row["r1"])
            d2 = (d1_0 - d1_1) / (row["r0"] + row["r1"])
            corr3 = row["w_d1"] * d1 - row["w_d2"] * d2
            corr1 = row["w_d1"] * d1_0

            corr = jnp.where(
                row["mode"] >= 2.0, corr3,
                jnp.where(row["mode"] >= 1.0, corr1, jnp.zeros_like(corr3)),
            )
            x_new = x_new + corr
            noise = (row["noise"] if inj is not None
                     else jax.random.normal(kn, x.shape, x.dtype))
            x_new = x_new + row["noise_c"] * noise
            x = jnp.where(row["denoise_only"] > 0, d0, x_new)
            return (x, d0, d_1, k), None

        (x, _, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), jnp.zeros_like(x), key), tables
        )
        if debug:
            return x, None, None
        return x
