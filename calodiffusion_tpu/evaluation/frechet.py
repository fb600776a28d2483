"""Frechet Physics Distance (FPD) - self-contained.

The reference delegates to ``jetnet.evaluation.fpd`` (reference:
calodiffusion/train/evaluate.py:70-79; jetnet is not installable here), so
the algorithm from the underlying paper (arXiv:2211.10295, "Evaluating
generative models in high energy physics") is implemented directly:

1. standardize features;
2. compute the Gaussian Frechet distance on random same-size subsets over a
   range of sizes;
3. linearly extrapolate FD vs 1/N to N -> infinity; the intercept is the
   FPD and the fit error its uncertainty.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def frechet_gaussian_distance(x: np.ndarray, y: np.ndarray) -> float:
    mu1, mu2 = x.mean(axis=0), y.mean(axis=0)
    sigma1 = np.cov(x, rowvar=False)
    sigma2 = np.cov(y, rowvar=False)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def fpd(
    real_features: np.ndarray,
    gen_features: np.ndarray,
    min_samples: int = 500,
    max_samples: int = 10000,
    num_batches: int = 10,
    num_points: int = 10,
    seed: int = 42,
) -> tuple[float, float]:
    """Returns (fpd, fpd_error)."""
    x = np.nan_to_num(np.asarray(real_features, dtype=np.float64))
    y = np.nan_to_num(np.asarray(gen_features, dtype=np.float64))

    n = min(len(x), len(y), max_samples)
    min_samples = min(min_samples, n // 2) or 1
    # standardize against the real sample
    mean, std = x.mean(axis=0), x.std(axis=0) + 1e-8
    x = (x - mean) / std
    y = (y - mean) / std

    rng = np.random.default_rng(seed)
    batch_sizes = np.unique(
        (1.0 / np.linspace(1.0 / min_samples, 1.0 / n, num_points)).astype(int)
    )
    vals, inv_n = [], []
    for bs in batch_sizes:
        for _ in range(num_batches):
            xi = x[rng.choice(len(x), size=bs, replace=False)]
            yi = y[rng.choice(len(y), size=bs, replace=False)]
            vals.append(frechet_gaussian_distance(xi, yi))
            inv_n.append(1.0 / bs)
    vals = np.asarray(vals)
    inv_n = np.asarray(inv_n)
    # linear fit FD = a/N + fpd
    A = np.stack([inv_n, np.ones_like(inv_n)], axis=1)
    coef, res, *_ = np.linalg.lstsq(A, vals, rcond=None)
    # standard error of the intercept
    dof = max(len(vals) - 2, 1)
    resid_var = (res[0] / dof) if len(res) else np.var(vals - A @ coef)
    cov = resid_var * np.linalg.inv(A.T @ A)
    return float(coef[1]), float(np.sqrt(max(cov[1, 1], 0.0)))
