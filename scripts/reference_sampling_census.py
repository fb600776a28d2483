"""Census of the reference's eager sampling step: op count + tensor traffic.

Quantifies the sampling-side "reference on A100" comparison the same way
the training side was argued (BASELINE.md): runs ONE DDIM denoise step of
the actual reference package (/root/reference, ds2 model, batch 128) on
CPU under a TorchDispatchMode that records every aten op and the bytes it
reads/writes.  Op count and tensor sizes are hardware-independent, so they
give defensible floors for what the same eager program would cost on an
A100:

  - launch/dispatch floor: n_ops x ~5 us (CUDA launch + eager dispatch;
    published eager overheads are 5-20+ us/op, 5 is charitable)
  - memory floor: every eager op materializes its outputs to HBM and
    re-reads its inputs -> (read+write bytes) / 2.0 TB/s (A100 80GB)
  - compute floor: analytic U-Net FLOPs / peak (TF32 156 TFLOP/s; the
    reference samples in f32, cuDNN TF32 conv is the torch default)

Writes reference_sampling_census.json at the repo root and prints the
floor table.  Reference entry points: calodiffusion/models/calodiffusion.py
(CaloDiffusion), models/sample.py:29-120 (DDim sampler loop).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_baselines.reference_torch import (  # noqa: E402
    REFERENCE_ROOT,
    _ds2_config,
    _stub_missing_modules,
)

BATCH = 128
# analytic useful FLOPs for one batch-128 denoise of the ds2 U-Net (same
# architecture both frameworks; from XLA cost analysis, bench.py)
FLOPS_PER_STEP = 6.165e11
A100_TF32 = 156e12  # dense TF32 peak, A100 80GB
A100_HBM = 2.0e12   # bytes/s, A100 80GB SXM
DISPATCH_S = 5e-6   # charitable per-op eager dispatch + launch cost


def main() -> dict:
    _stub_missing_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch
    from torch.utils._python_dispatch import TorchDispatchMode

    torch.manual_seed(0)
    from calodiffusion.models.calodiffusion import CaloDiffusion  # noqa: E402

    model = CaloDiffusion(_ds2_config(), n_steps=400, loss_type="l2")
    model.eval()

    stats = {"n_ops": 0, "n_mat_ops": 0, "out_bytes": 0, "in_bytes": 0,
             "by_op": {}}

    # aliasing / allocation ops: no HBM data movement of their own (their
    # consumers' reads are counted at the consumer)
    VIEW_OPS = {
        "aten.view", "aten._unsafe_view", "aten.reshape", "aten.slice",
        "aten.select", "aten.permute", "aten.transpose", "aten.t",
        "aten.unsqueeze", "aten.squeeze", "aten.expand", "aten.alias",
        "aten.detach", "aten.as_strided", "aten.new_empty", "aten.empty",
        "aten.empty_like", "aten.lift_fresh",
    }

    def tensor_bytes(x):
        if isinstance(x, torch.Tensor):
            return x.numel() * x.element_size()
        if isinstance(x, (list, tuple)):
            return sum(tensor_bytes(t) for t in x)
        return 0

    class Census(TorchDispatchMode):
        def __torch_dispatch__(self, func, types, args=(), kwargs=None):
            out = func(*args, **(kwargs or {}))
            stats["n_ops"] += 1
            name = str(func.overloadpacket)
            if name not in VIEW_OPS:
                stats["n_mat_ops"] += 1
                stats["in_bytes"] += tensor_bytes(args)
                stats["out_bytes"] += tensor_bytes(out)
            stats["by_op"][name] = stats["by_op"].get(name, 0) + 1
            return out

    E = torch.rand(BATCH, 1)
    layers = torch.randn(BATCH, 46)
    start = torch.randn(BATCH, 1, 45, 16, 9)
    sampler = model.sampler_algorithm

    with torch.no_grad():
        sampler(model, start, E, layers, 2, 0, False)  # warm caches
        t0 = time.perf_counter()
        with Census():
            # 2 steps; the per-step cost of the DDim loop is uniform
            sampler(model, start, E, layers, 2, 0, False)
        census_wall = time.perf_counter() - t0

    n_ops = stats["n_ops"] / 2
    n_mat = stats["n_mat_ops"] / 2
    rw_bytes = (stats["in_bytes"] + stats["out_bytes"]) / 2
    top = sorted(stats["by_op"].items(), key=lambda kv: -kv[1])[:12]

    floors = {
        # only materializing ops charged a launch (views are dispatcher
        # -only: charging them too would be unfair to the reference)
        "dispatch_floor_ms": n_mat * DISPATCH_S * 1e3,
        "memory_floor_ms": rw_bytes / A100_HBM * 1e3,
        "compute_floor_ms": FLOPS_PER_STEP / A100_TF32 * 1e3,
    }
    result = {
        "batch": BATCH,
        "aten_ops_per_step": n_ops,
        "materializing_ops_per_step": n_mat,
        "tensor_rw_bytes_per_step": rw_bytes,
        "top_ops": dict(top),
        "a100_floors_ms_per_step": floors,
        "a100_floor_total_ms_per_step": max(floors.values()),
        "a100_floor_additive_ms_per_step": (
            floors["dispatch_floor_ms"] + floors["memory_floor_ms"]
        ),
        "census_wall_s_2steps_cpu": census_wall,
        "assumptions": {
            "flops_per_step": FLOPS_PER_STEP,
            "a100_tf32_flops": A100_TF32,
            "a100_hbm_bytes_per_s": A100_HBM,
            "dispatch_s_per_op": DISPATCH_S,
        },
    }
    out_path = os.path.join(REPO, "reference_sampling_census.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)

    print(f"ops/step: {n_ops:.0f}   rw bytes/step: {rw_bytes/1e9:.2f} GB")
    for k, v in floors.items():
        print(f"{k}: {v:.2f}")
    print(f"wrote {out_path}")
    return result


if __name__ == "__main__":
    main()
