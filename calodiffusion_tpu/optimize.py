"""Optimization CLI (reference: calodiffusion/optimize.py - whose legacy
version references an undefined ``models`` dict at optimize.py:34,47; this
version wires the trainers in correctly).

Usage:
  python -m calodiffusion_tpu.optimize -c config.json -o COUNT FPD \
      --model diffusion --n-trials 20
"""

from __future__ import annotations

import argparse

from calodiffusion_tpu.train.optimize import Optimize
from calodiffusion_tpu.utils.config import LoadJson, dotdict


def optimize_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-d", "--data-folder", dest="data_folder",
                        default="./data/")
    parser.add_argument("-o", "--objectives", nargs="+", default=["COUNT"],
                        choices=["COUNT", "FPD", "CNN"])
    parser.add_argument("--model", default="diffusion",
                        choices=["diffusion", "layer"])
    parser.add_argument("--study-name", dest="study_name", default="optimize")
    parser.add_argument("--n-trials", dest="n_trials", type=int, default=10)
    parser.add_argument("--timeout", type=float, default=None,
                        help="Total study wall-clock budget in seconds "
                             "(default: unlimited)")
    parser.add_argument("--results-folder", dest="results_folder",
                        default="./optimization_results")
    parser.add_argument("-n", "--nevts", type=int, default=-1)
    parser.add_argument("--checkpoint", dest="checkpoint_folder",
                        default="./trained_models/")
    return parser


def optimize(args=None):
    parsed = optimize_parser().parse_args(args)
    flags = dotdict(vars(parsed))
    flags.config = LoadJson(flags.config)
    flags.load = False
    flags.reclean = False
    flags.reset_training = False
    flags.seed = 1234

    from calodiffusion_tpu.train.train_layer_model import TrainLayerModel
    from calodiffusion_tpu.train.trainer import TrainDiffusion

    trainers = {"diffusion": TrainDiffusion, "layer": TrainLayerModel}
    Optimize(flags, trainers[flags.model], flags.objectives)()


if __name__ == "__main__":
    optimize()
