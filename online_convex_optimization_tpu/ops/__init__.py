"""Numeric step kernels (reference layer 2 equivalents, TPU-first)."""

from online_convex_optimization_tpu.ops.hinge import (
    normalized_hinge,
    hinge_subgradient,
)
from online_convex_optimization_tpu.ops.actions import (
    ftl_action,
    ftrl_action,
    project_l2_ball,
    project_l1_ball,
    project_linf_ball,
)

__all__ = [
    "normalized_hinge",
    "hinge_subgradient",
    "ftl_action",
    "ftrl_action",
    "project_l2_ball",
    "project_l1_ball",
    "project_linf_ball",
]
