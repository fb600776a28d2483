"""Checkpoint I/O.

Same artifact contract as the reference (reference train/train.py:104-133):
per-name checkpoints ("checkpoint", "best_val", "final") carrying epoch,
model/optimizer state, LR-scheduler and early-stop state, and the full loss
histories, plus human-readable ``*_training_losses.txt`` /
``*_validation_losses.txt`` files and a ``config.json`` copy in the
checkpoint folder.

Arrays go through Orbax (async-capable, TPU-friendly); small host-side
state (epoch, histories, scheduler/early-stop dicts) lives in a JSON side
file so checkpoints remain human-inspectable.
"""

from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointMissingError(ValueError):
    """No checkpoint exists at the requested location."""


def _abspath(p: str) -> str:
    return os.path.abspath(os.path.expanduser(p))


_checkpointer = None


def _get_checkpointer():
    global _checkpointer
    if _checkpointer is None:
        _checkpointer = ocp.StandardCheckpointer()
    return _checkpointer


def save_arrays(path: str, tree: Any, wait: bool = True) -> None:
    """Orbax save.  ``wait=False`` leaves the write in flight (async) so
    per-epoch checkpoints overlap the next epoch; any previous in-flight
    save is drained first (orbax commits atomically via tmp-dir rename, so
    a crash mid-write never leaves a corrupt checkpoint)."""
    path = _abspath(path)
    ckptr = _get_checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(path, tree, force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_for_saves() -> None:
    """Block until any in-flight async save has committed."""
    _get_checkpointer().wait_until_finished()


def load_arrays(path: str, abstract_tree: Any | None = None) -> Any:
    path = _abspath(path)
    ckptr = _get_checkpointer()
    ckptr.wait_until_finished()
    if abstract_tree is not None:
        return ckptr.restore(path, abstract_tree)
    return ckptr.restore(path)


def save_checkpoint(
    folder: str,
    name: str,
    *,
    params: Any,
    opt_state: Any = None,
    ema_params: Any = None,
    swa_params: Any = None,
    swa_n: int = 0,
    epoch: int = 0,
    training_losses: dict | None = None,
    val_losses: dict | None = None,
    scheduler_state: dict | None = None,
    early_stop_state: dict | None = None,
    wait: bool = True,
) -> None:
    os.makedirs(folder, exist_ok=True)
    arrays = {"params": params}
    if opt_state is not None:
        arrays["opt_state"] = opt_state
    if ema_params is not None:
        arrays["ema_params"] = ema_params
    if swa_params is not None:
        arrays["swa_params"] = swa_params
    save_arrays(os.path.join(folder, name + ".ckpt"), arrays, wait=wait)

    host = {
        "epoch": int(epoch),
        "swa_n": int(swa_n),
        "train_loss_hist": {str(k): float(v) for k, v in (training_losses or {}).items()},
        "val_loss_hist": {str(k): float(v) for k, v in (val_losses or {}).items()},
        "scheduler_state": scheduler_state or {},
        "early_stop_dict": early_stop_state or {},
    }
    with open(os.path.join(folder, name + "_state.json"), "w") as f:
        json.dump(host, f)

    # human-readable loss histories (reference train.py:130-133)
    with open(os.path.join(folder, f"{name}_training_losses.txt"), "w") as f:
        f.write("\n".join(str(v) for v in (training_losses or {}).values()) + "\n")
    with open(os.path.join(folder, f"{name}_validation_losses.txt"), "w") as f:
        f.write("\n".join(str(v) for v in (val_losses or {}).values()) + "\n")


def inference_params(arrays: Any, host: dict) -> Any:
    """The weights inference should use from a loaded checkpoint:
    SWA tail average if one was accumulated (host ``swa_n`` > 0), else
    EMA, else raw params."""
    if host.get("swa_n", 0) and arrays.get("swa_params") is not None:
        return arrays["swa_params"]
    ema = arrays.get("ema_params")
    return ema if ema is not None else arrays["params"]


def load_checkpoint(folder: str, name: str, abstract_arrays: Any | None = None):
    """Returns (arrays, host_state).  ``arrays`` has keys params[/opt_state,
    ema_params, swa_params].

    Pass ``abstract_arrays`` (a pytree of like-structured arrays) to restore
    exact container types: orbax alone returns plain nested dicts, which
    breaks optax namedtuple states."""
    path = os.path.join(folder, name + ".ckpt")
    wait_for_saves()  # an async save of this very path may be in flight
    if not os.path.exists(_abspath(path)):
        raise CheckpointMissingError(f"No checkpoint at {path}")
    arrays = load_arrays(path, abstract_arrays)
    host = {}
    host_path = os.path.join(folder, name + "_state.json")
    if os.path.exists(host_path):
        with open(host_path) as f:
            host = json.load(f)
    host.setdefault("epoch", 0)
    host["train_loss_hist"] = {
        int(k): v for k, v in host.get("train_loss_hist", {}).items()
    }
    host["val_loss_hist"] = {
        int(k): v for k, v in host.get("val_loss_hist", {}).items()
    }
    return arrays, host
