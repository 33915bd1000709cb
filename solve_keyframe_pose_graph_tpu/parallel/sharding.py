"""Multi-chip sharding of the pose-graph solve over an ICI device mesh.

The reference is single-process shared-memory (SURVEY.md section 2.3); its
scaling ceiling is one CPU. The TPU-native scaling story for a pose graph is
the long-context/sequence-parallel analog: the node axis is trajectory-
contiguous, the odometry band couples each node only to its 5 predecessors
(PoseGraphSLAM.cpp:1577), so sharding nodes contiguously across devices makes
the band matvec nearest-neighbor (halo width 5) and leaves only the sparse
loop-closure blocks as global traffic.

We express this with `jax.sharding.NamedSharding` annotations on the Problem
pytree and let GSPMD insert the collectives (halo exchange for the shifted
band, all-to-all/gather for the loop-edge scatter rows) — the idiomatic
XLA path; hand-written ppermute halos live in ops/band.py's future work.

Axes:
  * "graph": node axis (Nc) and loop-edge axis (Ec) — sequence-parallel over
    the trajectory, data-parallel over loop residuals.
  * priors (handful of rows) are replicated.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from solve_keyframe_pose_graph_tpu.solver.problem import Problem


def make_mesh(n_devices: int | None = None, axis_name: str = "graph") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for "
                "CPU dry runs)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def problem_shardings(mesh: Mesh, axis_name: str = "graph") -> Problem:
    """A Problem-shaped pytree of NamedShardings.

    Node-axis arrays shard along the trajectory; loop-edge arrays shard along
    edges; the tiny prior family is replicated.
    """
    node = NamedSharding(mesh, P(axis_name))
    odo = NamedSharding(mesh, P(None, axis_name))
    edge = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return Problem(
        q=node, t=node, node_mask=node, free_mask=node,
        odo_q=odo, odo_t=odo, odo_w=odo, odo_mask=odo,
        loop_a=edge, loop_b=edge, loop_q=edge, loop_t=edge,
        loop_w=edge, loop_mask=edge, switch=edge,
        prior_idx=rep, prior_q=rep, prior_t=rep, prior_w=rep, prior_mask=rep,
    )


def shard_problem(problem: Problem, mesh: Mesh,
                  axis_name: str = "graph") -> Problem:
    """Place the Problem's device arrays according to the mesh layout.

    Capacities must divide the mesh size along the sharded axes (bucket sizes
    in config.CapacityConfig are powers of two, so any power-of-two mesh
    works).
    """
    sh = problem_shardings(mesh, axis_name)
    leaves = {
        f.name: jax.device_put(getattr(problem, f.name), getattr(sh, f.name))
        for f in dataclasses.fields(Problem)
    }
    return Problem(**leaves)
