"""Test configuration: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multi-chip path).
Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference tree not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def cat512_deform(reference_root):
    """Golden deformation fixture paths (ARAP/deformation/cat512_*)."""
    d = reference_root / "ARAP" / "deformation"
    return {
        "rgb": d / "cat512_iRGB.png",
        "mask": d / "cat512_iMsk.png",
        "cstr": d / "cat512_iCstr.txt",
        "wrgb": d / "cat512_wRGB.png",
        "wmask": d / "cat512_wMsk.png",
    }


@pytest.fixture(scope="session")
def cat512_warp(reference_root):
    """Golden warping fixture paths (ARAP/warping/cat512_*)."""
    d = reference_root / "ARAP" / "warping"
    return {
        "rgb": d / "cat512_iRGB.png",
        "mask": d / "cat512_iMsk.png",
        "flo": d / "cat512_iFlo.flo",
        "wrgb": d / "cat512_wRGB.png",
        "wmask": d / "cat512_wMsk.png",
    }
