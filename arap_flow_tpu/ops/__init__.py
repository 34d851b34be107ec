"""Device compute path: stencil shifts, ARAP energy derivatives, fused GN+PCG
solver loops, rasterization, correlation matching. All functions are pure,
jit-able, and vmap-able over a leading batch dimension.
"""

from .stencil import shift, DIRS  # noqa: F401
from .energy import (  # noqa: F401
    ArapWeights,
    ArapOperands,
    build_operands,
    anneal_constraints,
    residuals,
    cost,
    jtf_and_diag,
    apply_jtj,
    trig,
)
