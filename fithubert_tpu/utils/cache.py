"""Persistent XLA compilation cache setup.

One compile of the fused 12+12-layer train step costs ~75-90 s through the
remote TPU compile endpoint (and minutes on the 1-core CPU); the cache makes
every repeat run (resumes, benches, repeated smoke tests) skip straight to
execution. jax only caches the backend compile — tracing still runs — but
that is the cheap half off-CPU. Keyed by HLO hash: safe across code edits.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = "", probe_backend: bool = False) -> str:
    """Point jax at a persistent compilation cache directory and return it.

    Default location: `<repo>/.jax_cache` (gitignored), overridable via
    $FITHUBERT_CACHE_DIR or the argument. Must be called before the first
    compilation; later calls are harmless.

    CPU backends are EXCLUDED: reloading serialized XLA:CPU AOT executables
    tripped nondeterministic SIGABRTs in this environment (the loader also
    warns about machine-feature mismatches like +prefer-no-gather). The CPU
    compile-time story is carried by scan_layers instead; the TPU cache —
    which saves the ~80 s remote compiles — has been solid.
    """
    import jax

    # FAIL CLOSED: only enable when the platform is known non-CPU. The
    # configured platform string is consulted first (reading it never
    # initializes XLA — required before jax.distributed.initialize in
    # multi-host entry points). Entry points that never run multi-host
    # (bench, feature extraction, the driver's single-chip entry) may pass
    # probe_backend=True to resolve an unset platform via the live backend.
    platforms = str(jax.config.jax_platforms or "")
    names = [p for p in platforms.split(",") if p]
    if "cpu" in names:
        return ""
    if not names:
        if not probe_backend:
            return ""
        if jax.default_backend() == "cpu":
            return ""
    cache_dir = (
        cache_dir
        or os.environ.get("FITHUBERT_CACHE_DIR")
        or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
