"""On-device uint32-exact golden check: the hardware bit-exactness proof.

Interpret-mode CPU tests prove the kernel *math*; Mosaic lowering (rolls,
bitcasts, DMA schedules) is exactly what interpret mode does not exercise.
This runs a few samples of every two-input gate + mux at the full parameter
set on whatever device JAX resolves (the real TPU when run via
`python benchmarks/golden_check.py` or the suite's `golden` section) and
diffs the output ciphertexts uint32-for-uint32 against `golden.gate_lvl0`
(the reference's oracle pattern, test/test_util.h:8-95, strengthened from
decrypt-only to word-exact).

Prints one JSON line; exit 1 on any mismatched word.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin ignores the env var; force CPU before backend init
    import jax
    jax.config.update("jax_platforms", "cpu")


def golden_diff(ctx, sk, ek, rng, nb: int = 8,
                gates=("nand", "xor", "andny"), check_mux: bool = True):
    """uint32 mismatch count between device gates and the golden model.
    Returns (mismatched_words, total_words)."""
    import jax
    import jax.numpy as jnp

    from cufhe_tpu import golden as G
    from cufhe_tpu.models.api import Ctxt

    bits0 = rng.integers(0, 2, nb)
    bits1 = rng.integers(0, 2, nb)
    bits2 = rng.integers(0, 2, nb)
    enc = lambda bits: [G.encrypt_bit(int(v), sk, rng) for v in bits]
    ga, gb, gc = enc(bits0), enc(bits1), enc(bits2)
    stack = lambda cts: Ctxt(jnp.asarray(np.stack(cts).astype(np.uint32)), 0)
    a, b, c = stack(ga), stack(gb), stack(gc)

    mism = total = 0
    for name in gates:
        dev = np.asarray(jax.device_get(ctx.gate(name, a, b).data))
        want = np.stack([G.gate_lvl0(name, ga[i], gb[i], ek)
                         for i in range(nb)]).astype(np.uint32)
        mism += int(np.sum(dev != want))
        total += want.size
    if check_mux:
        dev = np.asarray(jax.device_get(ctx.mux(c, a, b).data))
        want = np.stack([G.mux_lvl0(gc[i], ga[i], gb[i], ek)
                         for i in range(nb)]).astype(np.uint32)
        mism += int(np.sum(dev != want))
        total += want.size
    return mism, total


def main() -> int:
    import jax

    from _keys import append_result, load_or_make_bench_keys
    from cufhe_tpu.models.api import Context

    pname = os.environ.get("GOLDEN_PARAMS", "tfhepp_128bit")
    backend = os.environ.get("GOLDEN_BACKEND", "auto")
    nb = int(os.environ.get("GOLDEN_SAMPLES", "8"))
    sk, ek = load_or_make_bench_keys(pname)
    ctx = Context(ek, backend=backend)
    rng = np.random.default_rng(23)
    mism, total = golden_diff(ctx, sk, ek, rng, nb=nb)
    rec = {"bench": "golden_onchip", "params": pname, "backend": backend,
           "samples": nb, "mismatched_words": mism, "total_words": total,
           "device": str(jax.devices()[0])}
    print(json.dumps(rec))
    append_result(rec)
    return 1 if mism else 0


if __name__ == "__main__":
    raise SystemExit(main())
