"""Persistent XLA compilation cache.

The remote TPU compile service takes 30-60 s per Pallas kernel, so a
cold CLI run over a whole motif database pays minutes of pure compile
wall before the first hit streams out (the reference CLI, being
ahead-of-time compiled Rust, pays nothing: ``lightmotif-cli/src/
main.rs:240-378``).  JAX's persistent compilation cache stores the
serialized executables on disk keyed by program fingerprint, so every
run after the first skips the compile service entirely.

Enabled by default for the CLI surface only (libraries should not
mutate global jax config on import).  Controlled by
``LIGHTMOTIF_TPU_COMPILE_CACHE``:

* unset      -> ``~/.cache/lightmotif-tpu/xla``
* a path     -> that directory
* ``0``/``off``/empty -> disabled
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT = os.path.join("~", ".cache", "lightmotif-tpu", "xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Returns the directory in use, or ``None`` when disabled.  Must run
    before the first jit compilation to catch everything (later calls
    still cache subsequent compiles).  Errors are non-fatal: a
    read-only filesystem degrades to uncached compiles, not a crash.
    """
    env = os.environ.get("LIGHTMOTIF_TPU_COMPILE_CACHE")
    if path is None:
        if env is not None and env.strip().lower() in ("", "0", "off", "false"):
            return None
        path = env or _DEFAULT
    path = os.path.expanduser(path)
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # every kernel here dwarfs the 1 s default threshold, but the
        # many small XLA helper programs (compaction, pvalue tables)
        # are each a fraction of a second yet add up across a cold CLI
        # start -- cache them all
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):
        return None
    return path
