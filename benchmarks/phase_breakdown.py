"""Phase breakdown of one NAND gate bootstrap at the headline config:
times (a) the full gate, (b) blind rotation alone, (c) extract+keyswitch
alone, (d) the KS one-hot decompose alone — each as its own jitted program
at the same batch, medians of reps. Run on the real TPU.

Usage: python benchmarks/phase_breakdown.py [batch]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin ignores the env var; force CPU before backend init
    import jax
    jax.config.update("jax_platforms", "cpu")


def _force(x):
    return np.asarray(jax.device_get(x))


def timed(fn, *args, reps=4, inner=4):
    """Median over reps of (inner async enqueues + one forced sync)/inner.

    Through the axon tunnel a single enqueue+sync costs ~30 ms of host
    round-trip regardless of the program (measured: a [4096,14336] bf16
    copy and a full 500 ms gate both pay it) — pipelining `inner`
    same-program calls before the one sync amortizes it to ~30/inner ms.
    Phases cheaper than ~10 ms are still reported dispatch-bound; the
    subtracted `null_ms` baseline in the output is the resolution floor.
    """
    red = jax.jit(lambda y: jnp.sum(y.astype(jnp.uint32)))
    _force(red(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _force(red(out))
        ts.append((time.perf_counter() - t0) / inner)
    return sorted(ts)[len(ts) // 2]


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from cufhe_tpu import TFHEPP_128, golden as G
    from cufhe_tpu.golden import GATE_CONSTANTS
    from cufhe_tpu.ops import bootstrap as B
    from cufhe_tpu.ops.bootstrap import (_gate_coeffs, _pre_add, blind_rotate,
                                         sample_extract_for_ks)
    from cufhe_tpu.ops.keys import prepare_keys
    from cufhe_tpu.ops.keyswitch import key_switch, ks_decompose_coeffs
    from cufhe_tpu.utils import serialization as S

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    params = TFHEPP_128
    cache = os.path.join(REPO, ".bench_keys_128.npz")
    ek = S.load_eval_key(cache)
    keys = prepare_keys(ek, backends=("pallas",))

    rng = np.random.default_rng(3)
    n0 = params.lvl0.dim
    mk = lambda: jnp.asarray(rng.integers(0, 1 << 32, size=(batch, n0 + 1),
                                          dtype=np.uint64).astype(np.uint32))
    in0, in1 = mk(), mk()

    nand = jax.jit(lambda a, b, k: B.gate_lvl0(
        GATE_CONSTANTS["nand"], a, b, k, params, backend="pallas"))

    @jax.jit
    def br_only(a, b, k):
        ca, cb, off = _gate_coeffs(GATE_CONSTANTS["nand"], params.lvl0.mu)
        aa, bb = _pre_add(a, b, ca, cb, off, n0)
        return blind_rotate(aa, bb, params.lvl1.mu, k, params, "pallas")

    @jax.jit
    def ks_only(acc, k):
        tlwe1 = sample_extract_for_ks(acc, params.lvl1)
        return key_switch(tlwe1, k.ksk_limbs_sei, params)

    @jax.jit
    def dec_only(tlwe1):
        return ks_decompose_coeffs(tlwe1[:, :params.lvl1.k * params.lvl1.n],
                                   params)

    acc = br_only(in0, in1, keys)
    _force(acc)
    tlwe1 = sample_extract_for_ks(acc, params.lvl1)
    _force(tlwe1)

    null = jax.jit(lambda a, b, k: a)

    r = {
        "batch": batch,
        "null_ms": round(timed(null, in0, in1, keys) * 1e3, 1),
        "full_nand_ms": round(timed(nand, in0, in1, keys) * 1e3, 1),
        "blind_rotate_ms": round(timed(br_only, in0, in1, keys) * 1e3, 1),
        "extract_ks_ms": round(timed(ks_only, acc, keys) * 1e3, 1),
        "ks_decompose_ms": round(timed(dec_only, tlwe1) * 1e3, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(r))
