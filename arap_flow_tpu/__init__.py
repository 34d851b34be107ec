"""arap_flow_tpu — TPU-native framework for dense non-rigid optical-flow ground-truth
generation, with the capabilities of lhoangan/arap_flow (arXiv:1812.01946).

The reference stack (Python2 driver -> C++ solver apps -> Opt/Terra JIT -> CUDA) is
rebuilt as one JAX/XLA/Pallas package:

- ``io``        Middlebury .flo + Sintel-format IO, PNG/mask conventions, constraints.
- ``ops``       Stencil energy derivatives, fused GN+PCG solver loops, rasterization,
                correlation-pyramid matching — the device compute path.
- ``models``    The ARAP deformation problem (energy spec + solve schedule) — the
                framework's flagship "model" (reference: arap_plan.t).
- ``parallel``  Device-mesh sharding of batched solves (replaces the reference's
                multi-GPU process farm, para_gen.py:560-567).
- ``pipeline``  Dataset-generation drivers preserving the reference CLI surface
                (para_gen.py / generate.py / run_arap.py / run_warp.py).
- ``native``    C++ host runtime: reference-exact rasterizer, .flo codec, async IO.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (validated to work across processes on
    this platform: 92s cold → 5s warm). The reference pays its Opt/Terra JIT
    per process per image size (o.t:867-872); we don't have to."""
    if _os.environ.get("ARAP_NO_COMPILE_CACHE") == "1":
        return
    # CPU-only runs (tests) must not share a cache with the TPU platform's
    # compile service: its CPU AOT artifacts carry other machine features.
    if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "ARAP_COMPILE_CACHE", _os.path.expanduser("~/.cache/arap_flow_tpu_xla")
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # jax absent or too old — non-fatal
        pass


_enable_compile_cache()

from . import io  # noqa: F401
