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
from online_convex_optimization_tpu.ops.pallas_game import (
    eta_sweep_packed,
    kernel_envelope,
    pack_per_seq,
    pack_sequences,
    pack_time_major,
    play_packed_stream,
    play_packed_stream_many,
    regrets_fused,
    simulate_linear_auto,
    simulate_linear_pallas_v2,
    stream_result,
    synthetic_regrets,
    unpack_result,
    zero_stream_carry,
)
from online_convex_optimization_tpu.ops.pallas_smart import (
    simulate_smart_pallas,
    smart_regrets_packed,
    smart_sweep_packed,
)
from online_convex_optimization_tpu.ops.pallas_trs import (
    ball_ls_action_pallas,
    trs_solve_packed,
)

__all__ = [
    "normalized_hinge",
    "hinge_subgradient",
    "ftl_action",
    "ftrl_action",
    "project_l2_ball",
    "project_l1_ball",
    "project_linf_ball",
    "eta_sweep_packed",
    "pack_per_seq",
    "kernel_envelope",
    "pack_sequences",
    "regrets_fused",
    "simulate_linear_auto",
    "simulate_linear_pallas_v2",
    "synthetic_regrets",
    "unpack_result",
    "simulate_smart_pallas",
    "smart_regrets_packed",
    "smart_sweep_packed",
    "pack_time_major",
    "play_packed_stream",
    "play_packed_stream_many",
    "stream_result",
    "zero_stream_carry",
    "ball_ls_action_pallas",
    "trs_solve_packed",
]
