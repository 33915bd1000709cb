from solve_keyframe_pose_graph_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    problem_shardings,
    shard_problem,
)
