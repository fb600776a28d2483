"""Build per-energy-bin average/std showers (the cold-diffusion /
ControlNet prior input; reference: calodiffusion/utils/create_average_showers.py).

Usage:
  python -m calodiffusion_tpu.tools.create_average_showers \
      -c config.json --data_folder DATA -o avg_showers.h5
"""

from __future__ import annotations

import argparse
import os

import h5py as h5
import numpy as np

from calodiffusion_tpu.utils.config import LoadJson
from calodiffusion_tpu.utils.preprocessing import load_calochallenge_h5


def build_average_showers(config: dict, data_folder: str, nevts: int = -1):
    dataset_num = config["DATASET_NUM"]
    orig_shape = "orig" in config.get("SHOWER_EMBED", "")
    binning_file = config.get("BIN_FILE", None)

    data, energies = None, None
    files = config["FILES"]
    for i, dataset in enumerate(files):
        d, e, _ = load_calochallenge_h5(
            os.path.join(data_folder, dataset),
            shape=config["SHAPE_PAD"],
            emax=config["EMAX"], emin=config["EMIN"],
            nevts=nevts,
            binning_file=binning_file,
            max_deposit=config["MAXDEP"],
            logE=config["logE"],
            showerMap=config["SHOWERMAP"],
            shower_scale=config.get("SHOWERSCALE", 0.001),
            nholdout=config.get("HOLDOUT", 0) if i == len(files) - 1 else 0,
            dataset_num=dataset_num,
            orig_shape=orig_shape,
        )
        data = d if data is None else np.concatenate((data, d))
        energies = e if energies is None else np.concatenate((energies, e))

    if not orig_shape:
        # match the loader's training-array layout (data/loader.py:189) so
        # the cold prior broadcasts against training batches and noise
        data = np.reshape(data, config["SHAPE_PAD"])
    energies = energies.reshape(-1)
    # log-preprocessed energies are ~uniform in [0, 1]
    nbins = 100 if dataset_num >= 2 else 15
    E_bins = np.linspace(-0.001, 1.0, nbins)
    bins = np.digitize(energies, E_bins) - 1

    shape = list(data.shape)
    shape[0] = nbins
    avg_showers = np.zeros(shape, dtype=np.float32)
    std_showers = np.zeros(shape, dtype=np.float32)
    for i in range(nbins):
        sel = bins == i
        if sel.any():
            avg_showers[i] = np.mean(data[sel], axis=0)
            std_showers[i] = np.std(data[sel], axis=0)
    return avg_showers, std_showers, E_bins


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_folder", default="../data/")
    parser.add_argument("-c", "--config", default="configs/test.json")
    parser.add_argument("--output", "-o", default="avg_showers.h5")
    parser.add_argument("--nevts", type=int, default=-1)
    flags = parser.parse_args()

    config = LoadJson(flags.config)
    avg, std, E_bins = build_average_showers(
        config, flags.data_folder, flags.nevts
    )
    print(f"Writing out to {flags.output}")
    with h5.File(flags.output, "w") as fout:
        fout.create_dataset("avg_showers", data=avg)
        fout.create_dataset("std_showers", data=std)
        fout.create_dataset("E_bins", data=E_bins)
    print("Done!")


if __name__ == "__main__":
    main()
