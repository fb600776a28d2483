"""Sampler-option plumbing matrix (reference tests/test_sampler_config.py):
each sampler's Optuna-searchable options must land in SAMPLER_SETTINGS."""

import pytest

from calodiffusion_tpu.train.optimize import Optimize
from calodiffusion_tpu.utils.config import dotdict


class MockSuggester:
    number = 0

    def suggest_int(self, name, *args, **kwargs):
        return 1

    def suggest_float(self, name, *args, **kwargs):
        return 1.0

    def suggest_categorical(self, name, choices, **kwargs):
        return choices[0]


SETTING_FIELDS = [
    ("DDim", []),
    ("DDPM", []),
    ("DPM", ["ETA", "S_NOISE"]),
    ("DPMPP3MSDE", ["ETA", "S_NOISE"]),
    ("DPMPPSDE", ["R"]),
    ("DPMPP2MSDE", ["ETA", "S_NOISE",
                    {"name": "SOLVER", "option": ["heun", "midpoint"]}]),
    ("LMS", [{"name": "NOISY_SAMPLE", "option": [True, False]},
             {"name": "ORIG_SCHEDULE", "option": [True, False]},
             "C1", "RHO", "SIGMA_MIN", "ORDER"]),
    ("Euler", [{"name": "NOISY_SAMPLE", "option": [True, False]},
               {"name": "ORIG_SCHEDULE", "option": [True, False]},
               "C1", "RHO", "SIGMA_MIN", "S_MIN", "S_MAX", "S_NOISE",
               "S_CHURN"]),
    ("Heun", [{"name": "NOISY_SAMPLE", "option": [True, False]},
              {"name": "ORIG_SCHEDULE", "option": [True, False]},
              "C1", "RHO", "SIGMA_MIN", "S_MIN", "S_MAX", "S_NOISE",
              "S_CHURN"]),
    ("DPM2", [{"name": "NOISY_SAMPLE", "option": [True, False]},
              {"name": "ORIG_SCHEDULE", "option": [True, False]},
              "C1", "RHO", "SIGMA_MIN", "S_MIN", "S_MAX", "S_NOISE",
              "S_CHURN"]),
    ("Restart", [{"name": "NOISY_SAMPLE", "option": [True, False]},
                 {"name": "ORIG_SCHEDULE", "option": [True, False]},
                 "C1", "RHO", "SIGMA_MIN", "RESTART_GAMMA", "C2",
                 "RESTART_I", "N_RESTART"]),
    ("DPMAdaptive", ["ORDER", "R_TOL", "A_TOL", "H_INIT", "T_ERROR",
                     "ACCEPT_SAFETY"]),
]


@pytest.mark.parametrize("sampler_name,options", SETTING_FIELDS)
def test_sampler_setups(sampler_name, options):
    sampler_options = {}
    for option in options:
        if not isinstance(option, dict):
            sampler_options[option] = [0, 10]
        else:
            sampler_options[option["name"]] = option["option"]

    flags = dotdict(
        nevts=10,
        config={
            "SAMPLER": sampler_name,
            "NSTEPS": 10,
            "OPTIMIZE": {"SAMPLER_SETTINGS": sampler_options},
        },
        data_folder="./data/",
        frac=0.85,
        load=False,
    )
    opt = Optimize(flags, trainer=None, objectives=[])
    config = opt.suggest_config(MockSuggester())
    settings = config["SAMPLER_SETTINGS"]
    for option in options:
        if isinstance(option, str):
            assert option in settings, f"Missing {option} for {sampler_name}"
            assert settings[option] == 1, f"{option} == {settings[option]}"
    # runtime options mirror the settings
    assert config["SAMPLER_OPTIONS"] == settings

    # every suggested configuration must construct a valid sampler
    from calodiffusion_tpu.samplers import get_sampler

    config2 = dict(config)
    config2["SAMPLER_OPTIONS"] = dict(settings)
    sampler = get_sampler(sampler_name)(config2)
    assert sampler is not None
