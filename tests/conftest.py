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
