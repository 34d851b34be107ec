"""Model layer: the ARAP deformation problem — the framework's flagship model
(the reference's 22-line Opt energy spec arap_plan.t plus its solve schedule,
re-expressed as jitted JAX programs)."""

from .arap import ArapDeformer, DeformResult, deform  # noqa: F401
