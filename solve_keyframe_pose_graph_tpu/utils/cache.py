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

AOT EXECUTABLE cache (round 4): the HLO cache skips the XLA compile but a
warm process still pays trace + lower + jit machinery PER PROGRAM — at 10k
scale warmup() measured 284 s warm (20 bucket programs, ~14 s each) on
this 1-vCPU host, far from the reference's instant start. aot_load/
aot_save persist the COMPILED PjRt executables themselves
(jax.experimental.serialize_executable) to skip tracing entirely.
MEASURED OUTCOME on this tunneled TPU: a LOSS (warm warmup 518.9 s vs
284.2 s) — deserialization is fast but the first call of a deserialized
executable ships the ~96 MB program to the device (17-120 s each), which
the trace+HLO-cache path does not pay. The disk layer is therefore
OPT-IN (`KPG_AOT_DISK=1`, see _aot_path); the production answer to warm
startup latency is engine.warmup(background=True) — compile the first
bucket synchronously, warm the rest behind the device lock. Because
nothing is re-traced on a disk hit, the HLO-keyed invalidation above
cannot protect these entries; the key instead embeds
source_fingerprint() — a hash of every .py source in this package plus
the jax version and device kind — so any edit to the package (or a jax
upgrade, or a different chip) misses the cache and falls back to the
trace+compile path, which then re-saves. Entries are self-contained
(payload + arg pytree defs) and safe to delete at any time.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Optional

_enabled_dir: Optional[str] = None
_fingerprint: Optional[str] = None


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


def source_fingerprint() -> str:
    """Hash of this package's .py sources + jax version + device kind.

    The AOT executable cache's invalidation token: serialized executables
    bypass tracing, so the HLO-keyed persistent cache can't invalidate
    them — this fingerprint makes any source edit / jax upgrade / device
    change a cache miss instead. Computed once per process (~10 ms for the
    ~9k-LoC package)."""
    global _fingerprint
    if _fingerprint is not None:
        return _fingerprint
    import jax

    h = hashlib.sha256()
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                path = os.path.join(dirpath, fn)
                h.update(path.encode())
                with open(path, "rb") as f:
                    h.update(f.read())
    h.update(jax.__version__.encode())
    try:
        h.update(jax.devices()[0].device_kind.encode())
    except Exception:
        h.update(b"no-device")
    _fingerprint = h.hexdigest()[:24]
    return _fingerprint


def _aot_path(key: Any) -> Optional[str]:
    """File path for an AOT entry, or None when the cache is disabled.

    `key` is any repr-stable value (the solver builds it from static
    kwargs + problem shape signature); the filename hashes it together
    with the source fingerprint.

    OPT-IN ONLY (`KPG_AOT_DISK=1`), for two measured reasons:

      * XLA:CPU's AOT loader SEGFAULTS deserializing its own same-host
        executables (machine-feature mismatch `+prefer-no-scatter`,
        cpu_aot_loader.cc) — CPU backends are always excluded.
      * Over the TUNNELED TPU the layer is a net LOSS: deserialize_and_load
        is 1-10 s, but the FIRST CALL of a deserialized executable ships
        the ~96 MB program to the device and measured 17-120 s; a
        20-program 10k warmup through the disk layer landed 518.9 s vs
        284.2 s for trace+lower against the HLO persistent cache
        (benchmarks/results.json warmup_cache_10k history). On a
        direct-attached TPU the trade may invert — hence the env switch —
        but the measured default here is OFF.

    The in-process _AOT_CACHE is unaffected (always on)."""
    if _enabled_dir is None or os.environ.get("KPG_AOT_DISK") != "1":
        return None
    import jax

    if jax.devices()[0].platform == "cpu":
        return None
    digest = hashlib.sha256(
        (source_fingerprint() + "|" + repr(key)).encode()).hexdigest()[:32]
    return os.path.join(_enabled_dir, "aot", digest + ".aotx")


def aot_load(key: Any):
    """Load + device-load a serialized executable for `key`, else None."""
    path = _aot_path(key)
    if path is None or not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree)
    except Exception:
        # any mismatch (jax internals changed under an identical version
        # string, corrupt file, backend without deserialization support)
        # falls back to the compile path, which overwrites the entry
        return None


def aot_save(key: Any, compiled) -> bool:
    """Serialize a compiled executable under `key` (atomic write)."""
    path = _aot_path(key)
    if path is None:
        return False
    try:
        from jax.experimental import serialize_executable

        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        return True
    except Exception:
        return False
