"""Compare LM-solve configurations on the 5k/10k graph (real device).

Each variant is timed with the scalar-fetch barrier; chi^2 is reported so
speed can't silently trade away parity.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from solve_keyframe_pose_graph_tpu.ops import lm  # noqa: E402

VARIANTS = {
    "band": dict(preconditioner="band"),
    "band_frozen": dict(preconditioner="band", freeze_preconditioner=True),
    "jacobi": dict(preconditioner="jacobi"),
    "band_cg25": dict(preconditioner="band", max_cg_iterations=25),
    "jacobi_cg25": dict(preconditioner="jacobi", max_cg_iterations=25),
}


def main():
    import dataclasses

    prob, _ = bench.build()
    for name, kw in VARIANTS.items():
        def solve(p):
            return lm.lm_solve(p, max_iterations=10, **kw)
        res = solve(prob)
        base_cost = float(res.final_cost)   # also forces execution
        ts = []
        for i in range(4):
            p = dataclasses.replace(prob, t=prob.t + np.float32(1e-7 * (i + 1)))
            float(p.t[0, 0])
            t0 = time.perf_counter()
            r = solve(p)
            c = float(r.final_cost)
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{name:14s} {np.median(ts):8.1f} ms   chi2 {base_cost:.6g}   "
              f"lm {int(res.iterations)} acc {int(res.successful_steps)} "
              f"cg {int(res.total_cg_iterations)}")


if __name__ == "__main__":
    main()
