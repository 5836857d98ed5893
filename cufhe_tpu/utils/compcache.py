"""Persistent-compilation-cache setup with a reconnect-stable cache key.

The flagship kernels take minutes of XLA/Mosaic compile time; JAX's
persistent compilation cache is the difference between a ~16-minute cold
start and a seconds-long warm start.  But on a tunneled/remote PJRT
backend the stock cache key is fragile: jax hashes the backend's FULL
``platform_version`` string (jax/_src/cache_key.py ``_hash_platform``),
which for this plugin includes a per-server build stamp::

    PJRT C API
    axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49
    TFRT TPU v5 lite
    Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709

When a dropped link reconnects to a differently-built (but
compat-tag-identical) server, the ``Built on ... cl/...`` line changes,
every cache key changes, and the retry pays the full multi-minute
compile again — measured: four same-day runs of the identical program
wrote four distinct cache entries, while back-to-back runs on one link
produced identical keys.

``enable()`` turns the cache on and (by default) replaces the platform
hash with one over the *stable* lines only.  The executable-format
compatibility tags (``SerializedExecutable v9; compile-cache v14;
compat c49``) stay in the hash, so a genuinely incompatible server
change still misses and recompiles; only the build timestamp/changelist
noise is dropped.  Set ``CUFHE_STABLE_CACHE_KEY=0`` to keep stock
hashing.

(The reference has no compilation-cache analogue — nvcc compiles its
kernels ahead of time; on TPU the JIT model makes cold-start time a
first-class reliability concern for the capture harness, bench.py.)
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def _stable_platform_hash(hash_obj, backend) -> None:
    from jax._src import cache_key as _ck
    pv = getattr(backend, "platform_version", "")
    stable = "\n".join(line for line in pv.splitlines()
                       if not line.startswith("Built on"))
    _ck._hash_string(hash_obj, backend.platform)
    _ck._hash_string(hash_obj, stable)


def enable(cache_dir: str | None = None, *,
           min_compile_time_secs: float = 1.0,
           explain_misses: bool = False) -> str:
    """Enable the persistent compilation cache (idempotent).

    Must run before the first compilation.  Returns the cache directory.
    """
    import jax
    cache_dir = cache_dir or os.environ.get("CUFHE_CACHE_DIR", _DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    if explain_misses:
        jax.config.update("jax_explain_cache_misses", True)
    if os.environ.get("CUFHE_STABLE_CACHE_KEY", "1") == "1":
        from jax._src import cache_key as _ck
        if getattr(_ck, "_hash_platform", None) is not _stable_platform_hash:
            _ck._hash_platform = _stable_platform_hash
    return cache_dir
