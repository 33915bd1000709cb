"""TPU-native keyframe pose-graph SLAM back-end.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
ROS/Ceres node ``mpkuse/solve_keyframe_pose_graph``: a streaming 6-DOF pose
graph over VIO keyframes with switchable-constraint loop closures
(Sunderhauf & Protzel 2012), multi-world "kidnap" recovery via a disjoint-set
of coordinate frames, warm-started incremental re-solves, corrected-trajectory
composition, and JSON checkpoint/restore compatible with the reference's
on-disk schema.

Architecture (TPU-first, not a port):
  - functional core / imperative shell: all graph state lives in
    fixed-capacity padded SoA device arrays; the solver is one jitted
    Levenberg-Marquardt program (batched analytic-Jacobian residual kernels +
    block-sparse Gauss-Newton normal equations solved by preconditioned CG,
    entirely in HBM).
  - host-side Python handles ingest, world bookkeeping, triggers and I/O
    (replacing the reference's 9 mutex-guarded threads with a snapshot
    pipeline).

Reference layer map: see SURVEY.md section 1. Reference entry point:
/root/reference/src/keyframe_pose_graph_slam_node.cpp.
"""

__version__ = "0.1.0"

from solve_keyframe_pose_graph_tpu.config import Config  # noqa: F401
