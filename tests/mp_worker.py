"""Worker process for the multi-process SPMD test (test_multiprocess.py).

Usage: python tests/mp_worker.py <pid> <nproc> <port> <data_dir>

With nproc>1, initializes jax.distributed over localhost (the DCN path of a
real multi-host TPU pod, scaled down to CPU), shards the input files by
process through NpzDataset, assembles the global batch with
jax.make_array_from_process_local_data, and runs ONE jitted train step
(loss + grads + adam update) over the global ('data','model') mesh.
Prints MPLOSS / MPGNORM lines for the parent test to compare against the
single-process run.
"""

import os
import sys

pid, nproc, port, data_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

import glob  # noqa: E402

import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from calodiffusion_tpu.data.loader import NpzDataset  # noqa: E402
from calodiffusion_tpu.models.diffusion import CaloDiffusion  # noqa: E402
from calodiffusion_tpu.parallel import mesh as mesh_lib  # noqa: E402
from tests.utils_test import tiny_ds2_config  # noqa: E402

cfg = tiny_ds2_config(
    LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16, BATCH=8, NSTEPS=8
)

files = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
# per-process local batch x process_count = the same 16-event global batch
# in both modes (each shard file holds 8 events)
loader = NpzDataset(
    files, batch_size=16 // jax.process_count(),
    process_index=jax.process_index(), process_count=jax.process_count(),
)
E, layers, showers = next(iter(loader))

mesh = mesh_lib.make_mesh()
sh = NamedSharding(mesh, P("data"))
if nproc > 1:
    gE = jax.make_array_from_process_local_data(sh, E)
    glayers = jax.make_array_from_process_local_data(sh, layers)
    gshowers = jax.make_array_from_process_local_data(sh, showers)
else:
    # single process: the full dataset is local; same global content
    gE, glayers, gshowers = (jax.device_put(a, sh) for a in (E, layers, showers))

model = CaloDiffusion(cfg, n_steps=8, loss_type="l2")
params = mesh_lib.replicate(mesh, model.init(jax.random.PRNGKey(0)))
opt = optax.adam(1e-3)
opt_state = opt.init(params)


@jax.jit
def train_step(params, opt_state, key, data, E, layers):
    loss, grads = jax.value_and_grad(
        lambda p: model.compute_loss(p, key, data, E, layers=layers)
    )(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


params, opt_state, loss = train_step(
    params, opt_state, jax.random.PRNGKey(7), gshowers, gE, glayers
)
gnorm = optax.global_norm(params)
print(f"MPDEVICES {jax.device_count()} LOCAL {jax.local_device_count()}")
print(f"MPLOSS {float(loss):.10f}")
print(f"MPGNORM {float(gnorm):.10f}")
