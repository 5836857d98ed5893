"""Persistent-compile-cache key stability (utils/compcache.py).

The failure mode this guards: a tunnel reconnect lands on a
differently-built (compat-identical) backend server, the stock jax cache
key — which hashes the full platform_version build stamp — changes, and
a bench retry repays a multi-minute compile it already did.
"""
import hashlib

import pytest

from cufhe_tpu.utils import compcache


class _FakeBackend:
    platform = "tpu"

    def __init__(self, version):
        self.platform_version = version


_V1 = ("PJRT C API\n"
       "axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49\n"
       "TFRT TPU v5 lite\n"
       "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709")
_V2 = _V1.replace("Nov 12 2025 14:16:36 (1762985796) cl/831091709",
                  "Dec 01 2025 09:00:00 (1764579600) cl/999999999")
_V3 = _V1.replace("compat c49", "compat c50")


def _digest(backend):
    h = hashlib.sha256()
    compcache._stable_platform_hash(h, backend)
    return h.hexdigest()


def test_build_stamp_does_not_change_key():
    # same plugin, different server build stamp -> same hash
    assert _digest(_FakeBackend(_V1)) == _digest(_FakeBackend(_V2))


def test_compat_tag_still_gates_key():
    # the executable-format compatibility tag MUST invalidate the cache
    assert _digest(_FakeBackend(_V1)) != _digest(_FakeBackend(_V3))


def test_platform_still_hashed():
    b = _FakeBackend(_V1)
    c = _FakeBackend(_V1)
    c.platform = "cpu"
    assert _digest(b) != _digest(c)


def test_enable_idempotent_and_functional(tmp_path, monkeypatch):
    import jax
    import numpy as np
    from jax._src import cache_key as _ck

    monkeypatch.setenv("CUFHE_STABLE_CACHE_KEY", "1")
    prev = _ck._hash_platform
    # enable() mutates GLOBAL jax config: restore every knob afterwards,
    # or the rest of the test session writes multi-GB CPU executables
    # into this test's (deleted) tmp dir — observed as a fatal abort
    # inside put_executable_and_time during later Pallas tests.
    prev_cfg = {k: getattr(jax.config, k) for k in
                ("jax_compilation_cache_dir",
                 "jax_persistent_cache_min_entry_size_bytes",
                 "jax_persistent_cache_min_compile_time_secs")}
    try:
        d1 = compcache.enable(str(tmp_path / "c"))
        d2 = compcache.enable(str(tmp_path / "c"))
        assert d1 == d2
        assert _ck._hash_platform is compcache._stable_platform_hash
        # jit still works with the patched key path and writes the cache
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        out = jax.jit(lambda x: x + 1)(np.arange(4))
        assert list(np.asarray(out)) == [1, 2, 3, 4]
    finally:
        _ck._hash_platform = prev
        for k, v in prev_cfg.items():
            jax.config.update(k, v)
        # config restore alone is NOT enough: jax latches module globals
        # (_cache_initialized/_cache_checked/_cache_used) on first use,
        # so later compiles in this process would still write into this
        # test's deleted tmp dir — observed as a segfault serializing a
        # GB-scale CPU executable in a later Pallas test.
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()


def test_stable_key_opt_out(tmp_path, monkeypatch):
    import jax
    from jax._src import cache_key as _ck

    monkeypatch.setenv("CUFHE_STABLE_CACHE_KEY", "0")
    prev = _ck._hash_platform
    prev_cfg = {k: getattr(jax.config, k) for k in
                ("jax_compilation_cache_dir",
                 "jax_persistent_cache_min_entry_size_bytes",
                 "jax_persistent_cache_min_compile_time_secs")}
    try:
        compcache.enable(str(tmp_path / "c2"))
        assert _ck._hash_platform is prev
    finally:
        _ck._hash_platform = prev
        for k, v in prev_cfg.items():
            jax.config.update(k, v)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
