"""A/B the fused linear-attention kernel end-to-end: ds2 + ds3 sampling
throughput with CALODIFF_FUSED_ATTN toggled by the caller's environment."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

if __name__ == "__main__":
    tmpdir = tempfile.mkdtemp(prefix="ab_attn_")
    toggle = os.environ.get("CALODIFF_FUSED_ATTN", "1")
    for name, b in (("ds2", 128), ("ds3", 128)):
        cfg = bench._dataset_config(name, tmpdir)
        val, _ = bench.measure_sampling(cfg, b, 400, runs=3)
        print(f"RESULT fused={toggle} {name}: {val:.3f} showers/sec",
              flush=True)
