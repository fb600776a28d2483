"""Sampler registry, keyed by the same class names as the reference config
``SAMPLER`` field (reference: calodiffusion/utils/utils.py:1047-1061
load_attr) so existing configs run unchanged."""

from __future__ import annotations

from calodiffusion_tpu.samplers.ddpm import DDim, DDPM
from calodiffusion_tpu.samplers.dpm import (
    DPM,
    DPMAdaptive,
    DPMPP2M,
    DPMPP2MSDE,
    DPMPP2S,
    DPMPP3MSDE,
    DPMPPSDE,
)
from calodiffusion_tpu.samplers.edm import DPM2, LMS, Euler, Heun, Restart
from calodiffusion_tpu.samplers.misc import BespokeNonStationary, Consistency

SAMPLER_REGISTRY = {
    "DDim": DDim,
    "DDPM": DDPM,
    "DPM": DPM,
    "DPMAdaptive": DPMAdaptive,
    "DPMPP2S": DPMPP2S,
    "DPMPPSDE": DPMPPSDE,
    "DPMPP2M": DPMPP2M,
    "DPMPP2MSDE": DPMPP2MSDE,
    "DPMPP3MSDE": DPMPP3MSDE,
    "LMS": LMS,
    "Euler": Euler,
    "Heun": Heun,
    "DPM2": DPM2,
    "Restart": Restart,
    "Consistency": Consistency,
    "BespokeNonStationary": BespokeNonStationary,
}


def get_sampler(name: str):
    try:
        return SAMPLER_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"sampler '{name}' is not supported; pick from {list(SAMPLER_REGISTRY)}"
        )
