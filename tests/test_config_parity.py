"""Shipped-config parity: every config in configs/ must be value-identical
to the reference's (modulo relativized paths and the documented PRECISION
addition).  Round-3 audit found real drift here (ds3 LAYER_SIZE_UNET /
NOISE_SCHED / TIME_EMBED / SHOWERMAP / LR, ds1-pion U-Net sizing, truncated
HGCal file lists, and a SHOWERSCALE key that silently changed behavior) —
this test pins the contract.
"""

import os

import pytest

from calodiffusion_tpu.utils.config import LoadJson

REFERENCE_ROOT = os.environ.get("CALODIF_REFERENCE_ROOT", "/root/reference")
REF_CONFIGS = os.path.join(REFERENCE_ROOT, "calodiffusion", "configs")
OUR_CONFIGS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
)

if not os.path.isdir(REF_CONFIGS) and os.environ.get(
    "CALODIF_REQUIRE_REFERENCE"
):
    # CI sets CALODIF_REQUIRE_REFERENCE=1 after cloning the reference; a
    # missing checkout must then FAIL the run, not skip it green
    raise RuntimeError(
        f"CALODIF_REQUIRE_REFERENCE is set but no reference checkout at "
        f"{REFERENCE_ROOT} — config-parity tests would silently skip"
    )
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS), reason="reference checkout not available"
)

SHIPPED = [
    "config_dataset1_photon.json",
    "config_dataset1_pion.json",
    "config_dataset2.json",
    "config_dataset3.json",
    "config_HGCal.json",
    "config_HGCal_photons.json",
    "config_HGCal_pions.json",
    "config_dataset2_ae.json",
    "config_dataset2_diffu.json",
]

# our documented additions / allowed transforms
ADDED_KEYS = {"PRECISION"}


def _is_relativized_path(ref_val, our_val):
    return (
        isinstance(ref_val, str)
        and isinstance(our_val, str)
        and ref_val.startswith("/")
        and ref_val.endswith(our_val.split("/")[-1])
    )


@pytest.mark.parametrize("name", SHIPPED)
def test_config_matches_reference(name):
    ref = LoadJson(os.path.join(REF_CONFIGS, name))
    ours = LoadJson(os.path.join(OUR_CONFIGS, name))

    drift = {}
    for key in set(ref) | set(ours):
        if key in ADDED_KEYS:
            continue
        rv, ov = ref.get(key), ours.get(key)
        if rv == ov or _is_relativized_path(rv, ov):
            continue
        drift[key] = (rv, ov)
    assert not drift, f"{name} drifted from the reference: {drift}"

    # the SHOWER_SCALE spelling quirk must be preserved verbatim: the key
    # the reference ships is unread by both codebases (PARITY.md), and the
    # READ key SHOWERSCALE must not sneak in and change behavior
    if "SHOWER_SCALE" in ref:
        assert "SHOWER_SCALE" in ours and "SHOWERSCALE" not in ours


def test_every_shipped_config_loads_as_numbers():
    """LoadJson must return numerics for scientific-notation fields (YAML
    alone parses '1e-07' as a string)."""
    for name in SHIPPED:
        cfg = LoadJson(os.path.join(OUR_CONFIGS, name))
        if "ECUT" in cfg:
            assert isinstance(cfg["ECUT"], (int, float)), (name, cfg["ECUT"])
