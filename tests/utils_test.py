"""Shared test fixtures/helpers: tiny configs mirroring the shipped ones."""

import numpy as np


def tiny_ds2_config(**overrides):
    """Scaled-down dataset-2 config (same keys as configs/config_dataset2.json)."""
    cfg = {
        "FILES": ["dataset_2_1.hdf5"],
        "EVAL": ["dataset_2_2.hdf5"],
        "BIN_FILE": "",
        "DATASET_NUM": 2,
        "HOLDOUT": 0,
        "SHAPE_ORIG": [-1, 6480],
        "SHAPE_PAD": [-1, 1, 45, 16, 9],
        "SHAPE_FINAL": [-1, 1, 45, 16, 9],
        "BATCH": 4,
        "LR": 4e-4,
        "MAXEPOCH": 2,
        "EARLYSTOP": 20,
        "LAYER_SIZE_UNET": [16, 16, 16, 16],
        "COND_SIZE_UNET": 32,
        "BLOCK_ATTN": False,
        "MID_ATTN": False,
        "COMPRESS_Z": True,
        "EMAX": 1000.0,
        "EMIN": 1.0,
        "ECUT": 0.0000151,
        "logE": True,
        "MAXDEP": 2,
        "CYLINDRICAL": True,
        "SHOWERSCALE": 0.001,
        "SHOWERMAP": "layer-logit-norm",
        "R_Z_INPUT": True,
        "NOISE_SCHED": "log",
        "NSTEPS": 400,
        "CONSIS_NSTEPS": 100,
        "TRAINING_OBJ": "hybrid_weight",
        "LOSS_TYPE": "l2",
        "TIME_EMBED": "log",
        "COND_EMBED": "id",
        "SHOWER_EMBED": "",
        "CHECKPOINT_NAME": "tiny_ds2",
    }
    cfg.update(overrides)
    return cfg


def fake_batch(cfg, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    shape = [batch] + list(cfg["SHAPE_PAD"][1:])
    data = rng.standard_normal(shape).astype(np.float32)
    E = rng.uniform(0.1, 1.0, (batch, 1)).astype(np.float32)
    n_lay = cfg["SHAPE_FINAL"][2] + 1
    layers = rng.standard_normal((batch, n_lay)).astype(np.float32)
    return data, E, layers
