"""Quantitative per-component roofline for the ds2/ds3 sampling path
(VERDICT r2 #3): measure each conv shape in the U-Net mix against its
lane-padding-limited ideal, plus whole-model ablations, to establish how
close XLA already sits to the hardware bound — the prerequisite for (or
refutation of) a persistent-weights fused-conv Pallas pipeline.

Timing rules for this host (axon tunnel): block_until_ready is unreliable
for small dispatches, so every micro-measurement runs K iterations inside
ONE executable (lax.scan with a forced serial dependency) and fetches a
scalar to the host.

Run: python scripts/ds3_roofline.py [ds3|ds2|all]
Writes roofline_report.json next to BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12  # v5e bf16


def log(msg):
    print(f"[roofline] {msg}", flush=True)


def scan_time(fn, args, iters=30):
    """Wall time per iteration of fn chained serially inside one jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*carry)
            return out, None

        carry, _ = jax.lax.scan(body, args, None, length=iters)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a.astype(jnp.float32)), carry)

    out = run(args)  # compile + warmup
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(args)
        # scalar fetch forces completion over the tunnel
        jax.tree_util.tree_map(float, out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def conv_case(batch, spatial, cin, cout, dtype_str="bf16", iters=30):
    """One 3x3x3 conv (cylindrical-wrap padding excluded: measured free in
    round 1) at the given level geometry.  Returns dict with achieved and
    padded-ideal numbers."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    dtype = jnp.bfloat16 if dtype_str == "bf16" else jnp.float32
    z, a, r = spatial
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, z, a, r, cin), dtype)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout), dtype) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, cout, cin), dtype) * 0.05

    def pair(x):
        # cin->cout->cin so the scan carry chains; each iteration = 2 convs
        y = lax.conv_general_dilated(
            x, w1, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dtype,
        )
        y = jnp.tanh(y)  # cheap nonlinearity to defeat algebraic fusion
        return lax.conv_general_dilated(
            y, w2, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dtype,
        )

    t_pair = scan_time(lambda x: (pair(x),), (x,), iters)
    vox = z * a * r
    flops_pair = 2 * batch * vox * 27 * cin * cout * 2  # both convs
    achieved = flops_pair / t_pair

    def lane_frac(c):
        return min(c, 128) / (128 * np.ceil(c / 128))

    def k_frac(c_in):
        k = c_in * 27
        return k / (128 * np.ceil(k / 128))

    # padded-ideal: MXU runs full 128-lane tiles regardless; the best any
    # schedule can do is peak x (useful lanes) x (useful K rows)
    ideal_frac = 0.5 * (
        lane_frac(cout) * k_frac(cin) + lane_frac(cin) * k_frac(cout)
    )
    ideal_time = flops_pair / (PEAK * ideal_frac)
    return {
        "batch": batch, "spatial": list(spatial), "cin": cin, "cout": cout,
        "time_per_conv_ms": t_pair * 1e3 / 2,
        "achieved_tflops": achieved / 1e12,
        "useful_mfu_pct": 100 * achieved / PEAK,
        "padded_ideal_frac_pct": 100 * ideal_frac,
        "pct_of_padded_ideal": 100 * (ideal_time / t_pair),
    }


def levels_for(shape, compress_z, widths):
    """U-Net level geometries (mirrors nn_modules downsample chain)."""
    z, a, r = shape
    out = []
    for i in range(len(widths)):
        out.append((z, a, r))
        if i < len(widths) - 1:
            if compress_z:
                z = (z + 1) // 2
            a = (a + 1) // 2
            r = (r + 1) // 2
    return out


def model_measurements(name, batch, steps=400):
    """Whole-model: 400-step DDIM wall + cost analysis + attention/precision
    ablations."""
    import jax
    import jax.numpy as jnp

    import bench as bench_mod

    results = {}
    import tempfile

    tmp = tempfile.mkdtemp()
    base_cfg = bench_mod._dataset_config(name, tmp)

    for tag, over in (
        ("full", {}),
        ("no_block_attn", {"BLOCK_ATTN": False}),
        ("no_attn", {"BLOCK_ATTN": False, "MID_ATTN": False}),
    ):
        cfg = dict(base_cfg, **over)
        val, extra = bench_mod.measure_sampling(
            cfg, batch, steps, runs=1, want_flops=(tag == "full")
        )
        results[tag] = {"showers_per_sec": round(val, 3)}
        if extra:
            flops, best = extra
            results[tag].update(
                flops_per_run=flops,
                achieved_tflops=round(flops / best / 1e12, 2),
                useful_mfu_pct=round(100 * flops / best / PEAK, 2),
            )
        log(f"{name}/{tag}: {val:.2f} showers/s")
    return results


def main():
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    report = {}

    # per-conv roofline table over both families' level mixes
    cases = []
    if which in ("ds2", "all"):
        for (sp, cin, cout) in [
            ((45, 16, 9), 32, 32),
            ((45, 16, 9), 32, 64),   # widest fullres pairing
            ((23, 8, 5), 32, 32),
            ((12, 4, 3), 64, 64),
            ((6, 2, 2), 64, 64),
        ]:
            c = conv_case(128, sp, cin, cout)
            c["family"] = "ds2"
            cases.append(c)
            log(f"ds2 conv {sp} {cin}->{cout}: "
                f"{c['achieved_tflops']:.1f} TF/s "
                f"({c['pct_of_padded_ideal']:.0f}% of padded ideal "
                f"{c['padded_ideal_frac_pct']:.0f}%)")
    if which in ("ds3", "all"):
        for (sp, cin, cout) in [
            ((45, 50, 18), 32, 32),
            ((45, 50, 18), 32, 64),
            ((23, 25, 9), 32, 32),
            ((12, 13, 5), 64, 64),
            ((6, 7, 3), 64, 64),
        ]:
            c = conv_case(128, sp, cin, cout)
            c["family"] = "ds3"
            cases.append(c)
            log(f"ds3 conv {sp} {cin}->{cout}: "
                f"{c['achieved_tflops']:.1f} TF/s "
                f"({c['pct_of_padded_ideal']:.0f}% of padded ideal "
                f"{c['padded_ideal_frac_pct']:.0f}%)")
    report["conv_cases"] = cases

    # whole-model ablations
    if which in ("ds3", "all"):
        report["ds3"] = model_measurements("ds3", 128)
    if which in ("ds2", "all"):
        report["ds2"] = model_measurements("ds2", 128)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "roofline_report.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
