"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding paths are exercised without
TPU hardware (the driver separately dry-runs the multi-chip path on a virtual
mesh too).

This environment installs a TPU-plugin sitecustomize hook (PYTHONPATH) that
claims the (single) TPU at interpreter start — slow, and it serialises against
any other process holding the claim. Since that hook runs before conftest can
do anything, we re-exec pytest once with a cleaned environment.
"""

import os
import sys


def pytest_configure(config):
    """If the TPU-plugin sitecustomize is active, re-exec pytest with a clean
    CPU-only environment (stopping global capture first so output survives)."""
    if ".axon_site" not in os.environ.get("PYTHONPATH", ""):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = _force_device_count(env.get("XLA_FLAGS", ""))
    sys.stderr.write("[conftest] re-exec pytest with CPU-only jax env\n")
    sys.stderr.flush()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *args], env)


def _force_device_count(flags: str, n: int = 8) -> str:
    """REPLACE any pre-existing xla_force_host_platform_device_count rather
    than keeping it: a stale ambient flag with a count < 8 would make every
    multi-device test (sharded pipeline byte-identity, spatial halo,
    sharded prewarm) silently skip via its len(jax.devices()) guard and the
    suite would go green with the multi-chip coverage gone."""
    import re as _re

    flags = _re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", flags
    ).strip()
    return (flags + f" --xla_force_host_platform_device_count={n}").strip()


os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = _force_device_count(os.environ.get("XLA_FLAGS", ""))

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
