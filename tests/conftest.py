import os

# Force CPU with 8 virtual devices so multi-chip sharding tests run anywhere
# (mirrors the driver's dryrun environment).  The environment may pre-register
# a TPU PJRT plugin at interpreter start, so setting env vars alone is not
# enough: also flip the already-imported jax config before any backend is
# created.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: CondUnet fwd+bwd graphs take minutes to
# compile on CPU; cache them across test runs
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
