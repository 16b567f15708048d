"""Persistent XLA compilation cache.

Scene-graph programs here are large (integrator scan + remat + traversal
while-loops), and the TPU toolchain compiles them slowly (measured ~6.5 min
for a 48-mesh scene on the tunneled v5e, independent of mesh count). The
reference pays nothing here (C++ AOT), so the TPU-native answer is JAX's
persistent compilation cache: the second process start reuses the compiled
executable. Enabled by the CLI and bench entry points; opt out with
TINSEL_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature flags. XLA:CPU persists AOT
    binaries whose cache key does NOT include the compile machine's
    feature set — an entry written on a host with (say) AMX/AVX512
    prefer-no-gather executes as SIGILL/SIGSEGV on a host without them
    (r5: a 4.3 GB cache from a previous round's machine segfaulted the
    sharding tests mid-suite). Scoping the cache dir per host keeps each
    machine's binaries to itself."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    CPU runs (JAX_PLATFORMS=cpu — the test suite) get NO persistent
    cache by default: jaxlib's XLA:CPU AOT deserializer SEGFAULTED
    reading back entries written by the SAME process on the SAME host
    (r5, twice, compilation_cache.get_executable_and_time in the
    sharding tests; the cpu_aot_loader logs show it comparing internal
    prefer-no-gather/scatter pseudo-features that never match the host
    probe). TPU executables round-trip fine and carry the real compile
    -time win. TINSEL_CPU_COMPILE_CACHE=1 force-enables for CPU."""
    if os.environ.get("TINSEL_NO_COMPILE_CACHE") == "1":
        return None
    if (
        "cpu" in os.environ.get("JAX_PLATFORMS", "")
        and os.environ.get("TINSEL_CPU_COMPILE_CACHE") != "1"
    ):
        return None
    import jax

    path = path or os.environ.get(
        "TINSEL_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "tinsel_tpu",
            f"xla-{_host_fingerprint()}",
        ),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:
        return None
