"""Benchmark harness: shower-generation throughput + MFU on one chip.

Primary metric (BASELINE.md): generated showers/sec/chip at 400-step DDIM
sampling on the dataset-2 geometry, versus the PyTorch reference running on
CPU (measured once via bench_baselines/reference_torch.py and cached).

Also reported inside the one JSON line (extra keys):
  - mfu: model FLOP utilisation of the primary run (analytic FLOPs from
    XLA cost analysis / wall / chip peak)
  - train_samples_per_sec: jitted train-step throughput (fwd+bwd+Adam)
  - ds1 / ds3 / hgcal showers/sec on their geometries (BENCH_ALL=0 skips)
  - separation_power: Etot separation from the last fidelity run
    (fidelity_report.json, written by scripts/tpu_fidelity_check.py) -
    the "at matched separation power" clause of BASELINE.json

Prints exactly ONE compact JSON line (the driver records only the output
tail, so the line must stay short — round 3's ~90-key line overflowed the
capture and the round's numbers were lost, BENCH_r03.json "parsed": null):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
Per-family booleans + the headline AUCs ride in the line; the full
per-family fidelity detail stays in fidelity_report.json (logged to
stderr here for the record).
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def code_hash() -> str:
    """Hash of the compute-path sources the family extras depend on.

    The extras cache (bench_extras_cache.json) is only valid for the code
    that produced it; a kernel/model/sampler/quant change must invalidate
    it (VERDICT r3 Weak #1: cached extras silently survived code changes).
    """
    import hashlib

    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.join(here, "calodiffusion_tpu")
    h = hashlib.sha256()
    # the WHOLE package plus bench.py itself: loader/preprocessing changes
    # (and this file's own measurement code) must invalidate the cache too
    # (ADVICE r4), not just ops/models/samplers
    for d, _, files in sorted(os.walk(root)):
        if "__pycache__" in d:
            continue
        for fn in sorted(files):
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(d, fn), root)
                with open(os.path.join(d, fn), "rb") as f:
                    h.update(rel.encode() + b"\0" + f.read())
    with open(os.path.abspath(__file__), "rb") as f:
        h.update(b"bench.py\0" + f.read())
    return h.hexdigest()[:16]


# bf16 peak matmul TFLOP/s per chip by device kind (public specs)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def chip_peak_flops(precision: str) -> float | None:
    if "BENCH_PEAK_TFLOPS" in os.environ:
        return float(os.environ["BENCH_PEAK_TFLOPS"]) * 1e12
    import jax

    kind = jax.devices()[0].device_kind
    peak = None
    # Longest matching prefix wins: "TPU v5 lite" must resolve to the v5e
    # entry (197), not fall through to the bare "TPU v5" (v5p, 459).
    for name in sorted(PEAK_BF16, key=len, reverse=True):
        if kind.startswith(name):
            peak = PEAK_BF16[name]
            break
    if peak is None:
        log(f"unknown device kind '{kind}'; no MFU (set BENCH_PEAK_TFLOPS)")
        return None
    if precision != "bf16":
        peak = peak / 4.0  # f32 runs the MXU at quarter rate
    return peak


def compact_fidelity_extras(fid: dict) -> dict:
    """The fidelity keys that ride in the one-line bench JSON: per-family
    gate booleans + headline classifier AUCs + fewstep bests.  Everything
    else stays in fidelity_report.json — the driver records only the
    output tail, so this selection is what keeps BENCH_rN parseable
    (round 3's full ~90-key dump overflowed the capture and the round's
    numbers were lost).  Unit-pinned by tests/test_bench_line.py."""
    extras = {}
    extras["separation_power_etot"] = fid.get("Etot")
    extras["fidelity_ok"] = fid.get("ok")
    if "int8_ok" in fid:  # QUANT_INT8 accuracy gate (same weights)
        extras["int8_fidelity_ok"] = fid.get("int8_ok")
    extras["auc_ds2"] = fid.get("classifier_auc")
    extras["auc_ds2_int8"] = fid.get("int8_classifier_auc")
    for fam in ("hgcal", "ds1", "ds1pion", "layer", "ds3"):
        for k_in, k_out in ((f"{fam}_ok", f"{fam}_ok"),
                            (f"{fam}_int8_ok", f"{fam}_int8_ok"),
                            (f"{fam}_classifier_auc", f"auc_{fam}"),
                            (f"{fam}_int8_classifier_auc",
                             f"auc_{fam}_int8")):
            if k_in in fid:
                extras[k_out] = fid[k_in]
    # multi-seed cascade statistics (scripts/tpu_cascade_seeds.py): the
    # recipe-level gate over N independent trainings
    for k in ("layer_seed_n", "layer_seed_auc_mean", "layer_seed_auc_ci95",
              "layer_seeds_ok"):
        if k in fid:
            extras[k] = fid[k]
    # few-step production sampling (scripts/tpu_fewstep_check.py):
    # fastest (sampler, steps) that passed the same fidelity gate
    # whether the int8 fewstep rows were measured under the shipped
    # down-path fence (the production int8 recipe) — VERDICT r4 Weak #1
    # was exactly this flag being silently false
    if "fewstep_int8_fenced" in fid:
        extras["fewstep_int8_fenced"] = fid["fewstep_int8_fenced"]
    for pfx in ("fewstep", "fewstep_int8"):
        # teacher gate + its 400-step baseline AUC: every candidate
        # verdict inherits the teacher, so the line must say what the
        # ladder was measured FROM
        for k in (f"{pfx}_teacher_ok", f"{pfx}_baseline_auc"):
            if k in fid:
                extras[k] = fid[k]
        if fid.get(f"{pfx}_best"):
            extras[f"{pfx}_best"] = fid[f"{pfx}_best"]
            extras[f"{pfx}_best_showers_per_sec"] = (
                fid[f"{pfx}_best_showers_per_sec"]
            )
            extras[f"{pfx}_best_auc"] = fid.get(
                f"{pfx}_{fid[f'{pfx}_best']}_classifier_auc"
            )
        if fid.get(f"{pfx}_best_rel"):
            # fastest candidate that matches the 400-step baseline from
            # the same weights within metric noise (the teacher-quality-
            # independent sampler verdict)
            extras[f"{pfx}_best_rel"] = fid[f"{pfx}_best_rel"]
            extras[f"{pfx}_best_rel_showers_per_sec"] = (
                fid.get(f"{pfx}_best_rel_showers_per_sec")
            )
    return extras


def _base_config(**overrides):
    cfg = {
        "DATASET_NUM": 2,
        "SHAPE_ORIG": [-1, 6480],
        "SHAPE_PAD": [-1, 1, 45, 16, 9],
        "SHAPE_FINAL": [-1, 1, 45, 16, 9],
        "LAYER_SIZE_UNET": [32, 32, 64, 32],
        "COND_SIZE_UNET": 128,
        "BLOCK_ATTN": True, "MID_ATTN": True, "COMPRESS_Z": True,
        "CYLINDRICAL": True,
        "SHOWERMAP": "layer-logit-norm", "R_Z_INPUT": True,
        "NOISE_SCHED": "log", "NSTEPS": 400,
        "TRAINING_OBJ": "hybrid_weight", "LOSS_TYPE": "l2",
        "TIME_EMBED": "log", "COND_EMBED": "id", "SHOWER_EMBED": "",
        "SAMPLER": "DDim",
        "ECUT": 0.0000151, "EMAX": 1000.0, "EMIN": 1.0, "logE": True,
        "MAXDEP": 2,
        "CHECKPOINT_NAME": "bench",
        "PRECISION": os.environ.get("BENCH_PRECISION", "bf16"),
    }
    cfg.update(overrides)
    return cfg


def _dataset_config(name: str, tmpdir: str):
    """Benchmark geometry for each dataset family (shipped config sizes)."""
    if name == "ds2":
        return _base_config()
    if name == "ds3":
        return _base_config(
            DATASET_NUM=3,
            SHAPE_ORIG=[-1, 40500],
            SHAPE_PAD=[-1, 1, 45, 50, 18],
            SHAPE_FINAL=[-1, 1, 45, 50, 18],
            # reference config_dataset3.json ships a thinner U-Net than ds2
            LAYER_SIZE_UNET=[32, 32, 32, 32],
            TIME_EMBED="sigma", NOISE_SCHED="cosine",
        )
    if name == "ds1":
        # dataset-1 'orig-NN': in-model NNConverter embed in the loop.
        # Synthetic binning XML with the photon R-union grid (30 bins);
        # throughput is architecture-determined.
        xml = os.path.join(tmpdir, "bench_ds1.xml")
        edges = ",".join(str(2 * i) for i in range(31))
        with open(xml, "w") as f:
            f.write(
                '<Bins>\n<Particle name="photon">\n'
                + "".join(
                    f'  <Bin id="{i}" r_edges="{edges}" n_bin_alpha='
                    f'"{10 if 0 < i < 4 else 1}"/>\n'
                    for i in range(5)
                )
                + "</Particle>\n</Bins>\n"
            )
        total = 30 * (1 + 10 + 10 + 10 + 1)
        return _base_config(
            DATASET_NUM=1,
            BIN_FILE=xml,
            PART_TYPE="photon",
            SHOWER_EMBED="orig-NN",
            SHAPE_ORIG=[-1, total],
            SHAPE_PAD=[-1, 1, total],
            SHAPE_FINAL=[-1, 1, 5, 10, 30],
            LAYER_SIZE_UNET=[32, 32, 64, 96],
            R_Z_INPUT=False, PHI_INPUT=True,
        )
    if name == "hgcal":
        # HGCal with the in-model GLaM encode/decode in the loop on a
        # synthetic geometry of realistic size (~1950 cells, 28 layers)
        from calodiffusion_tpu.utils import hgcal_utils

        geom_path = os.path.join(tmpdir, "bench_geom.pkl")
        # nrings must stay below the 21 R-bins of the embedded grid (the
        # ring->bin compression only kicks in past ring 23)
        geom = hgcal_utils.make_synthetic_geom(
            nlayers=28, cells_per_ring=9, nrings=20
        )
        hgcal_utils.save_geom(geom, geom_path)
        C = geom.max_ncell
        return _base_config(
            HGCAL=True,
            DATASET_NUM=111,
            BIN_FILE=geom_path,
            SHOWER_EMBED="NN",
            SHAPE_ORIG=[-1, 28, C],
            SHAPE_PAD=[-1, 1, 28, C],
            SHAPE_FINAL=[-1, 1, 28, 12, 21],
            LAYER_SIZE_UNET=[32, 32, 64, 96],
            PHI_INPUT=True,
            EMAX=[100, 2.01, 1.572], EMIN=[50, 1.99, 1.57],
            logE=False, MAXDEP=1.0,
        )
    raise ValueError(name)


def measure_sampling(config, batch: int, num_steps: int, runs: int = 3,
                     want_flops: bool = False):
    """Returns (showers/sec, flops_per_run or None)."""
    import jax
    import jax.numpy as jnp

    from calodiffusion_tpu.models.diffusion import CaloDiffusion

    model = CaloDiffusion(config, n_steps=num_steps, loss_type="l2")
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    sampler = model.make_sampler()
    if model.int8_sampling_enabled():  # QUANT_INT8: calibrate outside jit
        t0 = time.perf_counter()
        model.prepare_int8(params)
        log(f"int8 calibration: {time.perf_counter() - t0:.1f}s "
            f"({len(model._int8_scales)} convs)")

    n_cond = 3 if config.get("HGCAL") else 1
    E = jnp.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, n_cond))
    )
    n_lay = config["SHAPE_FINAL"][2] + 1
    layers = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (batch, n_lay))
    )

    fn = jax.jit(
        lambda p, k: model.sample(
            p, k, E, layers=layers, num_steps=num_steps, sampler=sampler
        )
    )

    flops = None
    if want_flops:
        # XLA cost analysis counts a lax.scan/while body ONCE, so analyze a
        # single denoise step and scale by the sampler's step count (DDim:
        # one U-Net eval per step)
        try:
            x0 = jnp.zeros(
                (batch, *model._data_shape), jnp.float32
            )
            sig = jnp.ones((batch,) + (1,) * len(model._data_shape),
                           jnp.float32)
            den = jax.jit(
                lambda p, x: model.denoise(p, x, E=E, sigma=sig,
                                           layers=layers)
            )
            cost = den.lower(params, x0).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            step_flops = float(cost.get("flops", 0.0))
            flops = step_flops * num_steps if step_flops else None
            if flops:
                log(f"denoise step: {step_flops:.3e} FLOPs "
                    f"({step_flops / batch / 1e9:.2f} GFLOP/shower/step)")
        except Exception as e:
            log(f"cost analysis unavailable: {e}")

    log(f"compiling + warmup (batch={batch}, steps={num_steps}, "
        f"precision={config['PRECISION']}) ...")
    t0 = time.perf_counter()
    out = fn(params, jax.random.PRNGKey(3))
    jax.block_until_ready(out)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(runs):
        k = jax.random.PRNGKey(10 + i)
        t0 = time.perf_counter()
        out = fn(params, k)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    log(f"run times: {['%.3f' % t for t in times]}")
    best = min(times)
    return batch / best, (flops, best) if flops else None


def measure_train_step(config, batch: int, runs: int = 10,
                       want_flops: bool = False):
    """Jitted fwd+bwd+Adam samples/sec (the BASELINE.md training metric).

    With ``want_flops`` also returns the train-step MFU from XLA cost
    analysis of the compiled step (fwd+bwd+Adam — the same methodology as
    the sampling MFU; VERDICT r4 #7: track "A100 parity" by a number)."""
    import jax
    import jax.numpy as jnp
    import optax

    from calodiffusion_tpu.models.diffusion import CaloDiffusion

    model = CaloDiffusion(config, n_steps=400, loss_type="l2")
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    shape = [batch] + list(config["SHAPE_PAD"][1:])
    data = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    n_cond = 3 if config.get("HGCAL") else 1
    E = jax.random.uniform(jax.random.PRNGKey(2), (batch, n_cond))
    layers = jax.random.normal(
        jax.random.PRNGKey(3), (batch, config["SHAPE_FINAL"][2] + 1)
    )

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.compute_loss(p, key, data, E, layers=layers)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    from calodiffusion_tpu.ops.pallas_linear_attention import training_trace

    step_flops = None
    with training_trace():  # gradient trace: fused Pallas attention fwd+bwd
        # (default since the block backward kernel landed;
        # CALODIFF_FUSED_ATTN=fwdonly restores the unfused XLA chain)
        if want_flops:
            try:
                cost = step.lower(
                    params, opt_state, jax.random.PRNGKey(4)
                ).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                step_flops = float(cost.get("flops", 0.0)) or None
            except Exception as e:
                log(f"train cost analysis unavailable: {e}")
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(4))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(runs):
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(5 + i)
        )
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / runs
    log(f"train step: {dt * 1e3:.1f} ms @ batch {batch}")
    if not want_flops:
        return batch / dt
    mfu = None
    peak = chip_peak_flops(config.get("PRECISION", "bf16"))
    if step_flops and peak:
        mfu = step_flops / dt / peak
        log(f"train-step FLOPs {step_flops:.3e}, achieved "
            f"{step_flops / dt / 1e12:.1f} TFLOP/s, train MFU {mfu * 100:.1f}%")
    return batch / dt, mfu


def main():
    import tempfile

    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    num_steps = int(os.environ.get("BENCH_STEPS", 400))
    batch = int(os.environ.get("BENCH_BATCH", 128))
    bench_all = os.environ.get("BENCH_ALL", "1") != "0"
    precision = os.environ.get("BENCH_PRECISION", "bf16")

    tmpdir = tempfile.mkdtemp(prefix="bench_geo_")
    extras = {}

    # primary: ds2 sampling + MFU
    cfg2 = _dataset_config("ds2", tmpdir)
    ours, flops_info = measure_sampling(
        cfg2, batch, num_steps, want_flops=True
    )
    log(f"ours: {ours:.2f} showers/sec @ {num_steps}-step DDIM")
    if flops_info:
        flops, best = flops_info
        peak = chip_peak_flops(precision)
        if peak:
            mfu = flops / best / peak
            extras["mfu"] = round(mfu, 4)
            extras["tflops_per_shower"] = round(flops / batch / 1e12, 4)
            log(f"analytic FLOPs/run: {flops:.3e}  "
                f"achieved {flops / best / 1e12:.1f} TFLOP/s  "
                f"MFU {mfu * 100:.1f}%")

    # training throughput + train-step MFU (same cost-analysis methodology
    # as the sampling MFU)
    try:
        t_sps, t_mfu = measure_train_step(cfg2, batch, want_flops=True)
        extras["train_samples_per_sec"] = round(t_sps, 1)
        if t_mfu is not None:
            extras["train_mfu"] = round(t_mfu, 4)
    except Exception as e:
        log(f"train-step bench failed: {e}")

    # other dataset families (architecture-determined throughput).  A full
    # re-measure costs ~10 min of remote-TPU warmups, so results are cached
    # in bench_extras_cache.json and reused unless BENCH_REFRESH=1 (the
    # primary ds2 metric + MFU + train step above are ALWAYS fresh).
    extras_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_extras_cache.json"
    )
    if bench_all:
        refresh = os.environ.get("BENCH_REFRESH", "0") == "1"
        chash = code_hash()
        cached = None
        if not refresh and os.path.exists(extras_cache):
            with open(extras_cache) as f:
                cached = json.load(f)
            stale = cached.get("code_hash") != chash
            if stale:
                log(f"extras cache is stale (code_hash "
                    f"{cached.get('code_hash')} != {chash}); re-measuring")
                cached = None
        if cached:
            age_h = (time.time() - cached.get("ts", 0)) / 3600.0
            extras.update({k: v for k, v in cached.items()
                           if k not in ("code_hash", "ts")})
            extras["extras_cached"] = True
            log(f"family extras from cache {extras_cache} "
                f"(age {age_h:.1f}h, code_hash {chash}; "
                "BENCH_REFRESH=1 to re-measure)")
        else:
            fam = {}
            # per-family batch = smallest batch on the throughput plateau
            # (ds3: B32->0.74 vs B128->2.98 showers/s; hgcal: B64->13.1 vs
            # B128->25.5, B64 was occupancy-limited; ds1 nearly flat
            # 143.7@128 -> 147.8@512)
            for name, b in (("ds1", 512), ("ds3", 128), ("hgcal", 128)):
                try:
                    cfg = _dataset_config(name, tmpdir)
                    val, _ = measure_sampling(cfg, b, num_steps, runs=1)
                    fam[f"{name}_showers_per_sec"] = round(val, 3)
                    log(f"{name}: {val:.2f} showers/sec @ batch {b}")
                except Exception as e:
                    log(f"{name} bench failed: {e}")
            # per-family TRAIN throughput (VERDICT r4 #7).  ds3 trains at
            # its shipped config batch (64 — the full-res activation
            # working set at batch 128 exceeds HBM in the backward pass).
            for name, b in (("ds1", 512), ("ds3", 64), ("hgcal", 128)):
                try:
                    cfg = _dataset_config(name, tmpdir)
                    val = measure_train_step(cfg, b, runs=5)
                    fam[f"{name}_train_samples_per_sec"] = round(val, 1)
                    log(f"{name} train: {val:.1f} samples/sec @ batch {b}")
                except Exception as e:
                    log(f"{name} train bench failed: {e}")
            # opt-in W8A8 int8 sampling (ops/quant.py; TPU-only).  Skip
            # entirely when the backend won't actually dispatch int8 —
            # otherwise the plain bf16 numbers would be recorded (and
            # cached) under *_int8_* keys.
            from calodiffusion_tpu.ops import quant

            if not quant.int8_allowed():
                log("int8 bench skipped: backend does not dispatch int8 "
                    "(ops/quant.int8_allowed() is False)")
            else:
                for name, b in (("ds2", batch), ("ds1", 512), ("ds3", 128),
                                ("hgcal", 128)):
                    try:
                        cfg = dict(_dataset_config(name, tmpdir),
                                   QUANT_INT8=True)
                        val, _ = measure_sampling(cfg, b, num_steps, runs=1)
                        fam[f"{name}_int8_showers_per_sec"] = round(val, 3)
                        log(f"{name} int8: {val:.2f} showers/sec @ batch {b}")
                    except Exception as e:
                        log(f"{name} int8 bench failed: {e}")
                # int8 with the down-path accuracy fence
                # (QUANT_INT8_EXCLUDE, docs/INT8_CASCADE.md): the
                # configuration well-trained models need — record its
                # throughput so the fence's speed cost is visible
                try:
                    cfg = _dataset_config("ds2", tmpdir)
                    n_res = len(cfg["LAYER_SIZE_UNET"]) - 1
                    cfg = dict(
                        cfg, QUANT_INT8=True,
                        QUANT_INT8_EXCLUDE=(
                            [f"ResnetBlock_{i}/" for i in range(2 * n_res)]
                            + [f"CondUnet_0/Conv3d_{i}"
                               for i in range(n_res - 1)]
                        ),
                    )
                    val, _ = measure_sampling(cfg, batch, num_steps, runs=1)
                    fam["ds2_int8_fenced_showers_per_sec"] = round(val, 3)
                    log(f"ds2 int8+fence: {val:.2f} showers/sec")
                except Exception as e:
                    log(f"ds2 int8+fence bench failed: {e}")
            extras.update(fam)
            with open(extras_cache, "w") as f:
                json.dump(dict(fam, code_hash=chash, ts=time.time()), f,
                          indent=1)

    # fidelity gate: separation power from the last training-fidelity run
    # (BASELINE.json: throughput "at matched separation power").  The
    # final line carries only the per-family VERDICTS (booleans) and the
    # headline classifier AUCs — the full ~90-key per-family detail stays
    # in fidelity_report.json (the side file; dumped to stderr here so the
    # driver log still carries it) to keep the stdout line parseable.
    rep = os.path.join(os.path.dirname(__file__), "fidelity_report.json")
    if os.path.exists(rep):
        with open(rep) as f:
            fid = json.load(f)
        log("fidelity_report.json (full detail): " + json.dumps(fid))
        extras.update(compact_fidelity_extras(fid))

    try:
        from bench_baselines.reference_torch import measure_reference_cpu

        baseline = measure_reference_cpu()
        log(f"reference torch-CPU: {baseline:.3f} showers/sec @400-step DDIM")
    except Exception as e:  # baseline machine may lack reference checkout
        log(f"baseline measurement failed ({e}); using cached/NaN")
        baseline = float("nan")

    vs = ours / baseline if baseline == baseline and baseline > 0 else float("nan")
    line = json.dumps({
        "metric": "ds2_showers_per_sec_per_chip_400step_ddim",
        "value": round(ours, 3),
        "unit": "showers/sec/chip",
        "vs_baseline": round(vs, 3) if vs == vs else None,
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in extras.items()},
    })
    log(f"final line: {len(line)} chars")
    print(line)


if __name__ == "__main__":
    main()
