"""Multi-chip scaling over a jax.sharding.Mesh.

The reference scales with a round-robin multi-GPU process farm + tmp list files
(para_gen.py:441-445, 560-567). Here the same axes are expressed as a device
mesh (SURVEY.md §2.7):

- ``data`` axis: frame pairs / segments sharded across chips (embarrassingly
  parallel — no cross-chip communication per solve);
- ``space`` axis: image rows sharded across chips with 1-px ppermute halo
  exchange for the stencil and psum'd PCG reductions — the context-parallel
  analogue, for frames exceeding one chip's HBM (off by default).
"""

from .mesh import make_mesh, shard_batch, solve_batch_sharded  # noqa: F401
from .spatial import solve_spatial  # noqa: F401
