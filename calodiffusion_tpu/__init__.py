"""CaloDiffusion-TPU: a TPU-native (JAX/Flax/pjit/Pallas) framework for
denoising-diffusion generation of calorimeter showers.

Re-designed from scratch for TPU hardware with the capability surface of the
reference PyTorch framework ``OzAmram/CaloDiffusion`` ("CaloDiffusion 2.0"):

- conditional 3D U-Net denoiser over cylindrical R x alpha x Z voxel grids
  (reference: calodiffusion/models/models.py),
- pluggable sampler zoo (DDPM/DDIM, EDM family, DPM-Solver++ family, Restart,
  Consistency, Bespoke Non-Stationary; reference: calodiffusion/models/sample.py),
- CaloChallenge datasets 1-3 and CMS HGCal geometry-latent embeddings
  (reference: calodiffusion/utils/utils.py, HGCal_utils.py),
- physics-fidelity evaluation (histograms + separation power, FPD, classifier)
  (reference: calodiffusion/utils/plots.py, train/evaluate.py).

TPU-first design notes
----------------------
- Compute path is pure JAX: the whole reverse-diffusion loop runs as a single
  jitted ``lax.scan`` resident on device (the reference runs a Python loop
  with one CUDA launch sequence per step).
- Tensors are channels-last (B, Z, A, R, C) internally so convolutions map
  directly onto the MXU; the external/cache layout stays reference-compatible
  (B, C, Z, A, R).
- Scale-out is SPMD over a ``jax.sharding.Mesh`` (data axis batch-sharding;
  model axis reserved), not per-process device management.
"""

__version__ = "0.1.0"
