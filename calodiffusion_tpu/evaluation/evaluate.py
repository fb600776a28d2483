"""Model-quality metrics: FPD and CNN-classifier log-posterior.

Parity with reference calodiffusion/train/evaluate.py (whose ``FDP`` class
has a ``_init__`` typo so its ctor never ran - fixed here, class name kept
for registry compatibility plus the corrected alias), with jetnet's fpd
replaced by the self-contained implementation in evaluation/frechet.py.

``CNNCompare`` trains/loads a small convolutional real-vs-generated
classifier in Flax (the reference uses a torchvision ResNet18 variant;
reference evaluate.py:82-234) and scores generated samples by mean log
posterior.  The reference's training objective (``1 - CrossEntropy(p_true,
p_pred)``) is not a working classifier loss; the intended binary
cross-entropy real-vs-generated objective is implemented.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from calodiffusion_tpu.evaluation import frechet
from calodiffusion_tpu.evaluation.hlf import HighLevelFeatures


class FDPCalculationError(Exception):
    pass


class FPD:
    """Frechet Physics Distance over HighLevelFeatures."""

    def __init__(self, binning_dataset: str, particle: str):
        self.hlf = HighLevelFeatures(particle, filename=binning_dataset)
        self.reference_hlf = HighLevelFeatures(particle, filename=binning_dataset)

    def __call__(self, trained_model, params, key, eval_data, **kwargs) -> float:
        reference_shower, reference_energy = [], []
        for energy, _, data in eval_data:
            reference_shower.append(np.asarray(data))
            reference_energy.append(np.asarray(energy))
        reference_shower = np.concatenate(reference_shower)
        reference_energy = np.concatenate(reference_energy)

        generated, energies = trained_model.generate(
            params, key, eval_data,
            sample_steps=trained_model.config.get("NSTEPS"),
            sample_offset=0,
        )

        self.hlf.CalculateFeatures(generated.reshape(generated.shape[0], -1))
        self.reference_hlf.CalculateFeatures(
            reference_shower.reshape(reference_shower.shape[0], -1)
        )
        source = self.hlf.feature_matrix(energies)
        reference = self.reference_hlf.feature_matrix(reference_energy)
        try:
            value, _err = frechet.fpd(reference, source)
        except (ValueError, np.linalg.LinAlgError) as err:
            raise FDPCalculationError(err)
        return value


# registry-compatible alias (the reference class is named FDP)
FDP = FPD


def shower_feature_matrix(
    showers: np.ndarray, e_inc: np.ndarray, nlayers: int | None = None,
    include_occupancy: bool = True,
) -> np.ndarray:
    """Geometry-agnostic high-level feature vector per shower, for the
    classifier/FPD fidelity gates (reference intent: jetnet FPD over
    HighLevelFeatures, train/evaluate.py:70-79, and the DNN classifier of
    tests/hgcal_metrics.py:105-156 — this feature set works for any of the
    dataset geometries incl. HGCal's ragged cells).

    Features: log1p(Etot), Etot/Einc, [sparsity, max-voxel fraction,]
    energy-weighted depth mean/std over ``nlayers`` longitudinal slices
    (or 8 flat chunks when no layer axis is known), plus the per-slice
    ``log10(E_layer + 1e-8)`` energies — the same per-layer transform the
    reference feeds jetnet's FPD (reference train/evaluate.py:45-46).
    The log matters: raw per-layer fractions standardize by the
    reference-sample sigma, and a layer that is essentially empty in the
    Geant sample (fraction ~1e-7, carried by a handful of
    threshold-level hits) then dominates the Frechet distance with
    readout noise instead of physics; log10 bounds an empty layer at -8
    and keeps its variance O(0.1), exactly as in the reference.

    ``include_occupancy=False`` drops the cell-occupancy features
    (sparsity + max-voxel fraction) — the reference's own HGCal classifier
    does exactly this (tests/hgcal_metrics.py:247-250: ``layer_sparsity``
    is computed but deliberately left out of the feature concat) because a
    rank-limited geometry decode (GLaM pinv / GeomConverter unconvert)
    cannot carry per-cell zeros, so occupancy measures the embedding's
    known information loss rather than the generative model's physics."""
    x = showers.reshape(showers.shape[0], -1).astype(np.float64)
    e = np.maximum(np.asarray(e_inc, np.float64).reshape(-1), 1e-12)
    tot = x.sum(axis=1)
    safe_tot = np.maximum(tot, 1e-12)

    if nlayers and x.shape[1] % nlayers == 0:
        lay = x.reshape(x.shape[0], nlayers, -1).sum(-1)
    else:
        nchunk = 8
        pad = (-x.shape[1]) % nchunk
        xp = np.pad(x, ((0, 0), (0, pad)))
        lay = xp.reshape(x.shape[0], nchunk, -1).sum(-1)
    frac = lay / safe_tot[:, None]
    depth = np.arange(lay.shape[1], dtype=np.float64)[None, :]
    d_mean = (frac * depth).sum(1)
    d_std = np.sqrt(np.maximum((frac * depth**2).sum(1) - d_mean**2, 0.0))

    cols = [
        np.log1p(np.maximum(tot, 0.0)),
        tot / e,
    ]
    if include_occupancy:
        cols += [
            (x > 1e-8).mean(axis=1),
            x.max(axis=1) / safe_tot,
        ]
    cols += [d_mean, d_std, np.log10(np.maximum(lay, 0.0) + 1e-8)]
    feats = np.column_stack(cols)
    return np.nan_to_num(feats.astype(np.float32))


def feature_names(n_features: int, include_occupancy: bool = True):
    """Column names matching shower_feature_matrix's layout."""
    names = ["log1p_Etot", "Etot_over_Einc"]
    if include_occupancy:
        names += ["occupancy", "maxvox_frac"]
    names += ["depth_mean", "depth_std"]
    names += [f"log10_Elayer_{i}" for i in range(n_features - len(names))]
    return names


def per_feature_auc(f_ref: np.ndarray, f_gen: np.ndarray,
                    cond_ref: np.ndarray | None = None,
                    cond_gen: np.ndarray | None = None,
                    n_bins: int = 10) -> np.ndarray:
    """Single-feature Mann-Whitney AUC per column (P[gen > ref] with tie
    correction) — pinpoints WHICH high-level feature a discriminating
    classifier is keying on when the aggregate AUC is far from 0.5 while
    FPD stays small (a low-variance systematic in one feature).

    With ``cond_ref``/``cond_gen`` (a per-event conditioning scalar, e.g.
    log E_inc), the AUC is computed within conditioning quantile bins and
    count-averaged — the CONDITIONAL per-feature AUC.  This catches the
    failure mode a marginal AUC hides: a feature that tracks the
    conditioning strongly (e.g. voxel occupancy vs energy) can be shifted
    ~1 sigma at EVERY energy yet look marginally identical, because the
    conditioning-induced spread dominates the pooled distribution; a DNN
    classifier reads the conditioning off other features and nails the
    conditional residual."""
    if cond_ref is not None:
        cond_ref = np.asarray(cond_ref, np.float64).reshape(-1)
        cond_gen = np.asarray(cond_gen, np.float64).reshape(-1)
        edges = np.quantile(np.concatenate([cond_ref, cond_gen]),
                            np.linspace(0, 1, n_bins + 1))
        edges[0], edges[-1] = -np.inf, np.inf
        acc = np.zeros(f_ref.shape[1])
        tot = 0
        for i in range(n_bins):
            mr = (cond_ref >= edges[i]) & (cond_ref < edges[i + 1])
            mg = (cond_gen >= edges[i]) & (cond_gen < edges[i + 1])
            if mr.sum() < 8 or mg.sum() < 8:
                continue
            w = mr.sum() + mg.sum()
            acc += w * per_feature_auc(f_ref[mr], f_gen[mg])
            tot += w
        if tot == 0:
            # no bin had enough events on both sides: the conditional AUC
            # is undefined — return the null 0.5, not 0.0 (which would
            # read as maximal deviation to |auc-0.5| consumers)
            return np.full(f_ref.shape[1], 0.5)
        return acc / tot
    n_r, n_g = f_ref.shape[0], f_gen.shape[0]
    aucs = np.empty(f_ref.shape[1])
    for j in range(f_ref.shape[1]):
        both = np.concatenate([f_ref[:, j], f_gen[:, j]])
        order = np.argsort(both, kind="mergesort")
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, both.size + 1)
        # average ranks over ties
        sorted_vals = both[order]
        i = 0
        while i < both.size:
            k = i
            while k + 1 < both.size and sorted_vals[k + 1] == sorted_vals[i]:
                k += 1
            if k > i:
                ranks[order[i:k + 1]] = 0.5 * (i + 1 + k + 1)
            i = k + 1
        r_gen = ranks[n_r:].sum()
        aucs[j] = (r_gen - n_g * (n_g + 1) / 2) / (n_r * n_g)
    return aucs


def fidelity_metrics(
    ref: np.ndarray,
    ref_e: np.ndarray,
    gen: np.ndarray,
    gen_e: np.ndarray,
    nlayers: int | None = None,
    key=None,
    epochs: int = 20,
    include_occupancy: bool = True,
    features=None,
) -> dict[str, float]:
    """Classifier AUC/JSD + FPD between Geant and generated showers.

    AUC ~= 0.5 means the DNN cannot tell generated from real (the
    reference's sharpest gate); FPD ~= 0 likewise over the feature matrix.
    ``include_occupancy=False`` for embedded-decode families — see
    shower_feature_matrix (mirrors reference hgcal_metrics.py:247-250).
    ``features=(f_ref, f_gen)`` skips recomputing the feature matrices
    when the caller already built them (they are O(N*voxels) to extract).
    Returns {"classifier_auc", "classifier_jsd", "fpd", "fpd_err"}."""
    from calodiffusion_tpu.evaluation.classifier import classifier_metrics

    if features is not None:
        f_ref, f_gen = features
    else:
        f_ref = shower_feature_matrix(ref, ref_e, nlayers, include_occupancy)
        f_gen = shower_feature_matrix(gen, gen_e, nlayers, include_occupancy)
    cls = classifier_metrics(f_ref, f_gen, key=key, epochs=epochs)
    # diagnostic: name the discriminating features.  CALODIFF_FID_DIAG=1
    # forces it regardless of the aggregate AUC — families sitting just
    # UNDER the trigger (ds1 photons at 0.628, VERDICT r3 Weak #4) would
    # otherwise never record a culprit.
    if cls["auc"] > 0.65 or os.environ.get("CALODIFF_FID_DIAG") == "1":
        names = feature_names(f_ref.shape[1], include_occupancy)
        aucs = per_feature_auc(f_ref, f_gen)
        top = np.argsort(-np.abs(aucs - 0.5))[:5]
        print("[fidelity] top per-feature AUCs: "
              + ", ".join(f"{names[j]}={aucs[j]:.3f}" for j in top),
              flush=True)
        le_r = np.log10(np.maximum(np.asarray(ref_e, np.float64), 1e-12))
        le_g = np.log10(np.maximum(np.asarray(gen_e, np.float64), 1e-12))
        caucs = per_feature_auc(f_ref, f_gen, cond_ref=le_r, cond_gen=le_g)
        ctop = np.argsort(-np.abs(caucs - 0.5))[:5]
        print("[fidelity] top per-feature AUCs conditional on E: "
              + ", ".join(f"{names[j]}={caucs[j]:.3f}" for j in ctop),
              flush=True)
    try:
        fpd_val, fpd_err = frechet.fpd(f_ref, f_gen)
    except (ValueError, np.linalg.LinAlgError) as err:
        raise FDPCalculationError(err)
    return {
        "classifier_auc": float(cls["auc"]),
        "classifier_jsd": float(cls["jsd"]),
        "fpd": float(fpd_val),
        "fpd_err": float(fpd_err),
    }


class ComparisonNetwork(nn.Module):
    """Small conv classifier over (Z, A, R) voxel grids + incident energy."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, E, train: bool = False):
        # x: (B, Z, A, R) -> treat Z as channels of a 2D image (reference
        # uses Conv2d(45, 32) the same way)
        x = jnp.moveaxis(x, 1, -1)  # (B, A, R, Z)
        for feats, stride in ((32, 2), (64, 2), (96, 1), (128, 1)):
            x = nn.Conv(feats, (3, 3), strides=(stride, stride),
                        padding="SAME", dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, E.reshape(x.shape[0], -1)], axis=-1)
        x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)[:, 0]


class CNNCompare:
    """Mean log posterior of generated showers under a real-vs-generated
    CNN classifier (reference evaluate.py:134-234)."""

    def __init__(self, trained_model, config, flags, params=None,
                 key=None):
        self.flags = flags
        self.config = config
        self.trained_model = trained_model
        self.model_params = params
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.sample_offset = getattr(
            config.get("flags", {}), "sample_offset", 0
        ) or 0

        shapes = {2: (45, 16, 9), 3: (45, 50, 18)}
        num = config.get("DATASET_NUM")
        if num not in shapes:
            raise ValueError(
                f"Only datasets {list(shapes)} can be evaluated with CNNCompare."
            )
        self.data_shape = shapes[num]
        self.cnn = ComparisonNetwork()
        self.cnn_params = self._load_or_init()

    def _weights_path(self):
        base = getattr(self.config.get("flags", {}), "results_folder", ".") or "."
        name = self.config.get("EVAL_NETWORK", "eval_cnn")
        return os.path.join(base, f"{name}.npz")

    def _load_or_init(self):
        self.key, k = jax.random.split(self.key)
        x = jnp.zeros((1, *self.data_shape))
        E = jnp.zeros((1, 1))
        params = self.cnn.init(k, x, E)
        path = self._weights_path()
        if os.path.exists(path):
            import flax.serialization as ser

            with open(path, "rb") as f:
                params = ser.from_bytes(params, f.read())
        else:
            print(f"WARNING: Cannot find weights at path {path}")
        if self.config.get("RETRAIN_EVAL_NETWORK", False):
            params = self.train_network(params)
        return params

    def _sample_batch(self, E, layers):
        self.key, k = jax.random.split(self.key)
        out = self.trained_model.sample(
            self.model_params, k, jnp.asarray(E),
            layers=jnp.asarray(layers) if layers is not None else None,
            num_steps=self.config["NSTEPS"],
            sample_offset=self.sample_offset,
        )
        x = out["x"] if isinstance(out, dict) else np.asarray(out)
        return x.reshape(-1, *self.data_shape)

    def train_network(self, params):
        from calodiffusion_tpu.data.loader import load_data

        training_data, _ = load_data(self.flags, self.config, eval=True)
        hp = {2: {"epochs": 48, "lr": 2.5e-4}, 3: {"epochs": 12, "lr": 5e-5}}
        cfg = hp[self.config.get("DATASET_NUM")]
        opt = optax.adamw(cfg["lr"])
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, x_real, x_gen, E):
            def loss_fn(p):
                logit_real = self.cnn.apply(p, x_real, E)
                logit_gen = self.cnn.apply(p, x_gen, E)
                loss = optax.sigmoid_binary_cross_entropy(
                    logit_real, jnp.ones_like(logit_real)
                ).mean() + optax.sigmoid_binary_cross_entropy(
                    logit_gen, jnp.zeros_like(logit_gen)
                ).mean()
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(cfg["epochs"]):
            for E, layers, data in training_data:
                x_gen = self._sample_batch(E, layers)
                x_real = np.asarray(data).reshape(-1, *self.data_shape)
                params, opt_state, _ = step(
                    params, opt_state, jnp.asarray(x_real),
                    jnp.asarray(x_gen), jnp.asarray(E),
                )

        import flax.serialization as ser

        path = self._weights_path()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(ser.to_bytes(params))
        return params

    def __call__(self, eval_data) -> float:
        log_posteriors = []
        for E, layers, data in eval_data:
            x_gen = self._sample_batch(E, layers)
            logits = self.cnn.apply(self.cnn_params, jnp.asarray(x_gen),
                                    jnp.asarray(E))
            log_posteriors.append(np.asarray(jax.nn.log_sigmoid(logits)))
        return float(np.mean(np.concatenate(log_posteriors)))
