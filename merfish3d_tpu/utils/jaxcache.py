"""Persistent XLA compilation cache wiring.

Compiles dominate two very different wall-clocks in this project:

- the tunneled single-chip TPU (compiles ship through the relay; measured
  14 s – 6 min per program depending on relay health), and
- the CPU test suite (hundreds of jitted programs re-traced per pytest
  process).

Both are one-line fixable with JAX's persistent compilation cache: the
serialized executable is keyed on (program, platform, topology, flags),
so a second process loads instead of recompiling.  The reference has no
analog (CuPy plan caches are in-memory only, `rlgc.py:39-70`); on TPU
the cache is the difference between a bench run that spends 80% of its
wall-clock in the compiler and one that starts measuring immediately.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_cache(path: str | os.PathLike | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent).

    Resolution order: explicit ``path`` arg, ``JAX_COMPILATION_CACHE_DIR``
    env var, ``~/.cache/merfish3d_tpu/jax``.  Set the env var to an empty
    string to disable.  Returns the cache dir in use (or None if disabled
    or JAX refuses the config — old versions, read-only filesystems)."""
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        if env == "":
            return None
        path = env or Path.home() / ".cache" / "merfish3d_tpu" / "jax"
    cache_dir = str(path)
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: tiny programs are exactly the ones the test
        # suite re-traces hundreds of times across processes
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
