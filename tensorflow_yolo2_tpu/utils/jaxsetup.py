"""Process-level JAX setup shared by entries and benchmarks.

Enables the persistent XLA compilation cache so the (minutes-long on this
class of host) TPU compiles amortize across processes and runs — the
entries are separate CLIs like the reference's scripts, so without this
every invocation would pay a fresh compile.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    # TFY2_PLATFORM=cpu forces the CPU backend for CLI entries — needed
    # because a JAX_PLATFORMS env var alone loses to an installed TPU
    # plugin (only the config update wins, and it must land before any
    # backend initializes). E.g. running --spatial N on a 1-chip host:
    #   TFY2_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N
    platform = os.environ.get("TFY2_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception as e:
            print(f"TFY2_PLATFORM={platform} not applied: {e}")

    cache_dir = cache_dir or os.environ.get(
        "TFY2_COMPILE_CACHE",
        os.path.join(os.environ.get("TFY2_ROOT", "/tmp"), "jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is best-effort
        print(f"compilation cache disabled: {e}")
