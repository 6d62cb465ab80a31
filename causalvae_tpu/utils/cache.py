"""Persistent XLA compile-cache setup, keyed by host-CPU signature.

XLA's persistent-cache key does not include the compiling host's CPU feature
set, so a ``.jax_cache`` populated on one machine can hand a different-ISA
host an executable that SIGILLs (observed as XLA's "compile machine features
don't match host" warning in the round-4 multichip artifact). Executables
compiled for the CPU backend are the only ISA-sensitive ones, but scoping the
whole cache per CPU signature is cheap and makes the artifact-of-record runs
(driver dryrun, bench) immune by construction: a new host gets a cold cache,
never a mismatched executable.
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
    """Point jax's persistent compilation cache at ``root/<cpu-tag>/``.

    Returns the directory used (empty string if configuration failed, e.g.
    a jax version without the config knob)."""
    import jax

    cache = os.path.join(root, host_cpu_tag())
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    except Exception:
        return ""
    return cache
