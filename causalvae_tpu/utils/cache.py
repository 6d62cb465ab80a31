"""Persistent XLA compile-cache setup, keyed by backend + host-CPU signature.

XLA's persistent-cache key does not include the compiling host's CPU feature
set, so a ``.jax_cache`` populated on one machine can hand a different-ISA
host a CPU-backend executable that SIGILLs (observed as XLA's "compile
machine features don't match host" warning in the round-4 multichip
artifact). Only CPU-backend executables are ISA-sensitive, so the cache is
scoped per CPU signature for the CPU backend only: a new host gets a cold
CPU cache (never a mismatched executable), while TPU executables — expensive
remote compiles, host-ISA-independent — stay shared across hosts in one
``tpu/`` directory (the driver's bench budget depends on that warmth).
"""

from __future__ import annotations

import hashlib
import os


def host_cpu_tag() -> str:
    """Short stable tag for this host's CPU ISA surface: machine arch +
    a hash of the cpuinfo feature flags (the bits that decide SIGILL)."""
    try:
        import platform

        arch = platform.machine() or "unknown"
    except Exception:
        arch = "unknown"
    flags = b""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith((b"flags", b"Features")):
                    flags = b" ".join(sorted(line.split(b":", 1)[1].split()))
                    break
    except OSError:
        pass
    return f"{arch}-{hashlib.sha256(flags).hexdigest()[:10]}"


def enable_compile_cache(root: str, min_secs: int = 5) -> str:
    """Point jax's persistent compilation cache at the backend-scoped subdir
    of ``root``: ``root/cpu-<cpu-tag>/`` on the CPU backend (ISA-sensitive
    executables), ``root/<backend>/`` otherwise (shared across hosts).

    Returns the directory used (empty string if configuration failed, e.g.
    a jax version without the config knob)."""
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    sub = f"cpu-{host_cpu_tag()}" if backend == "cpu" else backend
    cache = os.path.join(root, sub)
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    except Exception:
        return ""
    return cache
