"""Typed configuration for the whole framework.

The reference scatters its knobs across ROS params and compile-time macros
(see SURVEY.md section 5 "Config / flag system"; e.g. odometry fan-out f<6 at
PoseGraphSLAM.cpp:1577, weights at :1603-1606, 10 LM iters at :1272, 0.5 Hz
trigger poll at :1257, 30k-node capacity at :17-25, switch init 0.99 at
:351-361). Here everything is one frozen dataclass so a run is fully
reproducible from its config.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Levenberg-Marquardt + PCG settings (replaces ceres::Solver::Options).

    Reference: ceres SPARSE_NORMAL_CHOLESKY with max_num_iterations=10
    (PoseGraphSLAM.cpp:1270-1272). We run LM with block-Jacobi-preconditioned
    CG on the Gauss-Newton normal equations, fully on device.
    """

    max_lm_iterations: int = 10
    # Ceres defaults mirrored for chi^2 parity:
    initial_trust_region_radius: float = 1e4   # lambda0 = 1/radius
    function_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-10
    parameter_tolerance: float = 1e-8
    # PCG (inner linear solve). Defaults chosen for chi^2 parity with the
    # reference's EXACT inner solves (SPARSE_NORMAL_CHOLESKY): residual
    # forcing 1e-2 with a 45-iteration cap — certified equivalent to cap
    # 60 across 8 perturbed bench instances (escalated outcomes are
    # governed by the near-exact fp64 rung either way; healthy ones shift
    # <0.6% — benchmarks/warm_robust.json). cg_q_tolerance enables Ceres'
    # Q-based forcing rule (eta, e.g. 0.1) — a faster truncated mode whose
    # 10-iteration outcomes are noisier on loop-dense graphs.
    max_cg_iterations: int = 45
    cg_tolerance: float = 1e-2          # relative residual reduction
    cg_q_tolerance: float = 0.0         # 0 = off
    # warm forcing schedule: the first cg_warm_iters LM iterations solve CG
    # with a cg_warm_mult-times looser forcing (0 = off). Saves a few CG
    # iterations early in a solve at a small chi^2 cost; off by default.
    cg_warm_iters: int = 0
    cg_warm_mult: float = 3.0
    # The default is the CERTIFIED chi^2-parity configuration (the
    # reference needs zero per-dataset tuning — one ceres::Solve options
    # block, PoseGraphSLAM.cpp:1270-1272 — so our hands-free default must
    # be the quality config too): two-level band+coarse:64 at bcr_levels 2,
    # certified across 8 perturbed bench instances + the three analog
    # classes (benchmarks/warm_robust.json, BASELINE.md). "band" alone is
    # the measured streaming optimization (~7 ms faster steady-state at
    # 2k-node streaming sizes, identical robustness) for callers that want
    # it.
    preconditioner: str = "band+coarse"  # | "band" | "jacobi" |
                                        # "band*coarse" (symmetrized
                                        # multiplicative two-grid)
    bcr_levels: Optional[int] = 2       # truncate band cyclic reduction
                                        # (block-diag coarse solve); None =
                                        # full reduction. 2 measured equal-
                                        # or-better chi2 than 3 at a lower
                                        # factorize/apply cost.
    coarse_group: Optional[int] = None  # nodes per aggregate in the
                                        # two-level preconditioners; None =
                                        # auto-scaled from problem size
                                        # (ops/coarse.auto_coarse_group: 64
                                        # at bench scale, 128 at the 30k
                                        # capacity ceiling — the measured
                                        # crossovers, hands-free)
    band_impl: str = "emb"              # band-BCR pipeline: "emb" (entry-
                                        # major build + MXU AoS factorize,
                                        # bitwise = aos and -11 ms/solve at
                                        # bench scale) | "aos" (batched-
                                        # matmul form, ops/band.py) | "em"
                                        # (entry-major end to end, slower)
                                        # | "emb16"/"aos16" (bf16 factor
                                        # storage; certification:
                                        # benchmarks/warm_robust.json)
    # Loop-edge matvec formulation. "tiledrows6" (tile-padded one-hot,
    # j-reduction hoisted before the one-hot dot — the certified round-3
    # production form; BASELINE.md) needs a static per-tile capacity that
    # the engine computes
    # from the actual edge distribution (gn.tile_k_for); "sorted2" is the
    # capacity-free fallback (and the auto choice when a caller has no
    # host-side edge arrays to size the tiles from).
    loop_impl: str = "tiledrows6"
    # dtype for device solve: "float32" (TPU-native) or "float64" (parity
    # checks on CPU).
    dtype: str = "float32"
    # Adaptive-precision escalation (the reference's fp64-robustness
    # capability — Ceres doubles end-to-end, PoseGraphSLAM.cpp:1270): when
    # the fp32 solve hits >= escalate_rejects OVERSHOOT rejections (rejected
    # LM steps whose candidate cost rose materially — the distress signature
    # of fp32-conditioning-limited graphs; benign noise-floor rejections on
    # converged healthy solves are excluded, LMResult.distress_rejects), the
    # solve is re-run from the same initial guesses up the precision ladder:
    # "mixed" (fp64 assembly/cost + fp32 CG) first, full float64 (XLA
    # double-double emulation on TPU) if mixed still shows distress.
    # Healthy solves never escalate and pay nothing.
    adaptive_fp64: bool = True
    escalate_rejects: int = 3
    # Processor for the full-fp64 insurance rung. "auto" (default) runs the
    # exact-step native-CPU LDL^T rung (solver/cpu_rung.py — the reference's
    # own mode: fp64 Ceres on CPU, PoseGraphSLAM.cpp:1270; measured
    # 30-600x faster than TPU-emulated fp64 and leaves the chip free for
    # live triggers) whenever it is available for the residual family,
    # falling back to the chunked TPU rung otherwise. "cpu" requires the
    # native rung; "tpu" forces the emulated-fp64 device rung.
    fp64_backend: str = "auto"
    # Re-orthonormalize quaternions after each accepted LM step.
    renormalize: bool = True


@dataclasses.dataclass(frozen=True)
class ResidualConfig:
    """Residual-model settings (replaces CeresResidues.h compile-time picks).

    mode: "6dof" (quaternion residuals, the reference's active path) or
    "4dof" (yaw-weighted Euler variant, CeresResidues.h:252-422, available
    but not wired in the reference's active path).
    """

    mode: str = "6dof"
    use_switch_constraints: bool = True     # loop edges get switch variables
    switch_init: float = 0.99               # PoseGraphSLAM.cpp:351-361
    # NOTE: the switch-prior row scale is NOT configurable — the reference
    # bakes the s*(1-s) prior row into the residual with no weight
    # (CeresResidues.h:189-198) and chi^2 parity depends on reproducing
    # exactly that; a dead knob here would only invite drift.
    odometry_fanout: int = 5                # f = 1..5, PoseGraphSLAM.cpp:1577
    odometry_decay: float = 0.9             # weight 0.9^f
    odometry_yaw_sigma2: float = 6.0        # * exp(-yaw^2/6), :1603-1606
    # 4dof row scales (CeresResidues.h:303-305)
    yaw_scale: float = 4.0
    pitchroll_scale: float = 10.0


@dataclasses.dataclass(frozen=True)
class CapacityConfig:
    """Static padded-array capacities. XLA needs static shapes; arrays grow
    by bucket doubling and each bucket size gets its own compiled program.

    Reference hard-codes 30k nodes / 30k edges (PoseGraphSLAM.cpp:17-25);
    we start small and double on demand up to max_*.
    """

    initial_nodes: int = 1024
    initial_edges: int = 256
    max_nodes: int = 65536
    max_edges: int = 65536
    max_worlds: int = 64


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Streaming-engine rates (replace the reference thread loop rates)."""

    trigger_poll_hz: float = 2.0        # reference: 0.5 Hz poll (:1257); we
                                        # poll faster since a no-op poll is free
    assembler_hz: float = 30.0          # Composer.cpp:10 (30 Hz)
    # Leave the device solve of trigger N in flight instead of blocking on
    # it: the result is collected at the START of trigger N+1 (or by
    # engine.drain()). Because that collect runs before anything else in
    # trigger N+1, the overlap window covers the host ingest/compose work
    # BETWEEN triggers, not trigger N+1's own problem build — its initial
    # guesses read post-N opt values, exactly as in sync mode. Pays off
    # when ingest paces slower than the solve (the host returns to
    # ingesting immediately); a no-op in tight replay loops.
    async_dispatch: bool = False
    # Run the adaptive-precision escalated re-solve in a BACKGROUND thread:
    # the trigger serves its fp32/distressed result immediately (the
    # reference's solver loop never blocks the output pipeline — Composer
    # keeps extrapolating past the watermark, Composer.cpp:113-165) and the
    # escalated poses are written back through the state_lock machinery
    # when they land. The engine's device lock gives trigger solves
    # priority between escalation chunks. drain() (checkpoint/shutdown/
    # batch-solve barrier) joins the escalation, so batch CLI outcomes are
    # unchanged. False = pay the re-solve inline in the trigger (round-3
    # behavior: 42.2 s p90 on the 30k streaming row).
    background_escalation: bool = True
    # Incremental per-trigger problem maintenance (solver/incremental.py):
    # observation leaves stay device-resident and only the appended
    # nodes/edges + the (small) state bundle cross the tunnel — the
    # reference's persistent ceres::Problem analog (it adds only new
    # residual blocks per trigger, PoseGraphSLAM.cpp:1338-1640). Bitwise
    # equal to the from-scratch build; guards fall back automatically on
    # non-append-only changes (ablation, restore, re-bucketing).
    incremental_build: bool = True
    find_index_tol_ns: int = 1_000_000  # 1 ms timestamp match tolerance
                                        # (NodeDataManager.cpp:286)


@dataclasses.dataclass(frozen=True)
class IOConfig:
    save_dir: Optional[str] = None      # saveStateToDisk ROS param analog
    load_dir: Optional[str] = None      # loadStateFromDisk ROS param analog
    logging_dir: Optional[str] = None   # __LOGGING__ debug dump dir
    # Persistent XLA compile cache (utils/cache.enable_compile_cache),
    # enabled by SolverEngine.__init__ so every product entry point (CLI
    # solve/replay/serve, runtime server) skips re-compiling warm capacity
    # buckets — the analog of the reference's zero per-process compile cost
    # (AOT C++, keyframe_pose_graph_slam_node.cpp:233). "auto" = honor
    # JAX_COMPILATION_CACHE_DIR else <cwd>/.jax_cache; "" disables; any
    # other string = that directory. Cache keys include the program HLO, so
    # solver edits invalidate entries automatically.
    compile_cache_dir: str = "auto"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Multi-chip sharding of the PCG over an ICI mesh (optional; the graph
    fits one chip at reference scales — see SURVEY.md section 2.3)."""

    n_devices: int = 1
    axis_name: str = "graph"


@dataclasses.dataclass(frozen=True)
class Config:
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    residual: ResidualConfig = dataclasses.field(default_factory=ResidualConfig)
    capacity: CapacityConfig = dataclasses.field(default_factory=CapacityConfig)
    stream: StreamConfig = dataclasses.field(default_factory=StreamConfig)
    io: IOConfig = dataclasses.field(default_factory=IOConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        return Config(
            solver=SolverConfig(**d.get("solver", {})),
            residual=ResidualConfig(**d.get("residual", {})),
            capacity=CapacityConfig(**d.get("capacity", {})),
            stream=StreamConfig(**d.get("stream", {})),
            io=IOConfig(**d.get("io", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
        )
