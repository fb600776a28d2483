"""Classifier-separation metric: Geant4-vs-generated DNN with calibration.

Port of the reference's standalone classifier evaluation (reference:
calodiffusion/tests/hgcal_metrics.py:44-200 - binary DNN, isotonic
calibration, AUC + JSD reporting), re-implemented as a reusable JAX/Flax
module: a perfect generator gives AUC ~= 0.5 and JSD ~= 0.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class DNN(nn.Module):
    hidden: int = 256
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_layers):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)[:, 0]


def train_classifier(
    real: np.ndarray, gen: np.ndarray, key=None, epochs: int = 20,
    batch_size: int = 256, lr: float = 1e-3, val_frac: float = 0.3,
):
    """Train a real-vs-generated classifier on flat features; returns
    (apply_fn, params, (X_val, y_val))."""
    key = key if key is not None else jax.random.PRNGKey(0)
    X = np.concatenate([real.reshape(len(real), -1),
                        gen.reshape(len(gen), -1)]).astype(np.float32)
    y = np.concatenate([np.ones(len(real)), np.zeros(len(gen))]).astype(
        np.float32
    )
    # standardize
    mu, sd = X.mean(axis=0), X.std(axis=0) + 1e-8
    X = (X - mu) / sd

    rng = np.random.default_rng(0)
    perm = rng.permutation(len(X))
    X, y = X[perm], y[perm]
    n_val = int(val_frac * len(X))
    X_val, y_val = X[:n_val], y[:n_val]
    X_tr, y_tr = X[n_val:], y[n_val:]

    model = DNN()
    key, k = jax.random.split(key)
    params = model.init(k, jnp.zeros((1, X.shape[1])))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply(p, xb)
            return optax.sigmoid_binary_cross_entropy(logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(X_tr)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            sl = order[i: i + batch_size]
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(X_tr[sl]), jnp.asarray(y_tr[sl])
            )

    def apply_fn(x):
        x = (x.reshape(len(x), -1).astype(np.float32) - mu) / sd
        return np.asarray(jax.nn.sigmoid(model.apply(params, jnp.asarray(x))))

    return apply_fn, params, (X_val, y_val, model, mu, sd)


def auc_score(y_true: np.ndarray, y_prob: np.ndarray) -> float:
    """ROC AUC via the rank statistic (no sklearn dependency needed)."""
    order = np.argsort(y_prob)
    ranks = np.empty(len(y_prob))
    ranks[order] = np.arange(1, len(y_prob) + 1)
    n_pos = y_true.sum()
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float(
        (ranks[y_true > 0.5].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    )


def jsd_from_probs(y_true: np.ndarray, y_prob: np.ndarray,
                   calibrated: bool = True) -> float:
    """Jensen-Shannon divergence estimate from (optionally isotonic-
    calibrated) classifier probabilities (reference hgcal_metrics.py)."""
    p = np.clip(y_prob, 1e-7, 1 - 1e-7)
    if calibrated:
        try:
            from sklearn.isotonic import IsotonicRegression

            iso = IsotonicRegression(out_of_bounds="clip", y_min=1e-7,
                                     y_max=1 - 1e-7)
            p = iso.fit_transform(p, y_true)
            p = np.clip(p, 1e-7, 1 - 1e-7)
        except ImportError:
            pass
    # JSD = 1 + E_real[log2 p] ... standard classifier-based estimate:
    # JSD = 0.5 E_real[log2(2p)] + 0.5 E_gen[log2(2(1-p))]
    real, gen = y_true > 0.5, y_true <= 0.5
    jsd = 0.5 * np.mean(np.log2(2 * p[real])) + 0.5 * np.mean(
        np.log2(2 * (1 - p[gen]))
    )
    return float(max(jsd, 0.0))


def classifier_metrics(real: np.ndarray, gen: np.ndarray, key=None,
                       epochs: int = 20) -> dict[str, float]:
    """Full pipeline: train, calibrate, report {auc, jsd}."""
    apply_fn, _params, (X_val, y_val, model, mu, sd) = train_classifier(
        real, gen, key=key, epochs=epochs
    )
    probs = apply_fn(X_val * sd + mu)
    return {
        "auc": auc_score(y_val, probs),
        "jsd": jsd_from_probs(y_val, probs),
    }
