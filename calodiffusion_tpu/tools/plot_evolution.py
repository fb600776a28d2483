"""Sampler-evolution debug plots: distribution of normalized voxels along
the reverse trajectory (the working equivalent of the reference's legacy
calodiffusion/tests/plot_evolution.py, driven by the samplers' debug mode).

Usage:
  python -m calodiffusion_tpu.tools.plot_evolution -c config.json \
      --model-loc CKPT/..._Diffusion/final.ckpt -d DATA -o ./plots
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp

    from calodiffusion_tpu.data.loader import load_data
    from calodiffusion_tpu.train.trainer import TrainDiffusion
    from calodiffusion_tpu.utils.config import LoadJson, default_flags

    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--model-loc", required=True)
    ap.add_argument("-d", "--data-folder", default="./data")
    ap.add_argument("-o", "--plot-folder", default="./plots")
    ap.add_argument("--sample-steps", type=int, default=50)
    ap.add_argument("--nevts", type=int, default=64)
    args = ap.parse_args()

    config = LoadJson(args.config)
    flags = default_flags(
        data_folder=args.data_folder, model_loc=args.model_loc,
        nevts=args.nevts,
    )
    trainer = TrainDiffusion(flags, config, load_data=False)
    model, params = trainer.load_for_inference()

    loader, _ = load_data(flags, config, eval=True)
    E, layers, data = next(iter(loader))
    out = model.sample(
        params, jax.random.PRNGKey(0), jnp.asarray(E),
        layers=jnp.asarray(layers) if model.layer_cond else None,
        num_steps=args.sample_steps, debug=True,
    )
    x, xs, x0s = out
    xs, x0s = np.asarray(xs), np.asarray(x0s)

    os.makedirs(args.plot_folder, exist_ok=True)
    n_steps = xs.shape[0]
    checkpoints = sorted(set(
        [0, n_steps // 4, n_steps // 2, 3 * n_steps // 4, n_steps - 1]
    ))
    for j in checkpoints:
        fig = plt.figure(figsize=(8, 6))
        plt.hist(xs[j].reshape(-1), bins=40, density=True, histtype="step",
                 label=f"x (step {j})")
        plt.hist(x0s[j].reshape(-1), bins=40, density=True, histtype="step",
                 label=f"x0 pred (step {j})")
        plt.hist(np.asarray(data).reshape(-1), bins=40, density=True,
                 histtype="stepfilled", alpha=0.3, label="Geant4 (normed)")
        plt.xlabel("Normalized voxel value")
        plt.legend()
        fout = os.path.join(args.plot_folder, f"evolution_step{j}.png")
        fig.savefig(fout)
        plt.close(fig)
        print(f"wrote {fout}")


if __name__ == "__main__":
    main()
