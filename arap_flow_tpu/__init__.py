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

from . import io  # noqa: F401
