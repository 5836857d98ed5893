"""Staggered-schedule knob A/B: PEND (placement-queue depth), SEQ layout,
NBUF (band-buffer count) — schedule-only knobs that keep results bit-exact.

Unlike kernel_ab.py (which spawns one subprocess per config because
CUFHE_PALLAS_SKIP changes key layout and correctness), these knobs only
re-order the issue schedule, so one process can sweep them: keys stay
resident on device and jax.clear_caches() forces the kernel builder to
re-read the env and recompile (~30 s/config instead of ~5 min/config of
key prep).

Run: python benchmarks/sched_ab.py [batch [iters]]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

KNOBS = ("CUFHE_PEND", "CUFHE_SEQ", "CUFHE_NBUF", "CUFHE_STAGGER",
         "CUFHE_VMEM_MB")


def main() -> None:
    import jax

    from _keys import load_or_make_bench_keys
    from cufhe_tpu.models.api import Context, decrypt_bits, encrypt_bits

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    pname = os.environ.get("BENCH_PARAMS", "tfhepp_128bit")
    sk, ek = load_or_make_bench_keys(pname)
    ctx = Context(ek)
    rng = np.random.default_rng(7)
    bits0 = rng.integers(0, 2, batch)
    bits1 = rng.integers(0, 2, batch)
    a = encrypt_bits(bits0, sk, rng)
    b = encrypt_bits(bits1, sk, rng)

    configs = [
        {},                                          # shipping defaults
        {"CUFHE_PEND": "3", "CUFHE_VMEM_MB": "127"},
        {"CUFHE_SEQ": "block", "CUFHE_VMEM_MB": "127"},
        {"CUFHE_SEQ": "block", "CUFHE_PEND": "3", "CUFHE_VMEM_MB": "127"},
        {},                                          # repeat: variance gauge
    ]
    if len(sys.argv) > 3:                            # extra configs as JSON
        configs += json.loads(sys.argv[3])

    rows = []
    for cfg in configs:
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(cfg)
        jax.clear_caches()
        ctx._cache.clear()
        out = ctx.nand(a, b)                         # compile + warm
        np.asarray(jax.device_get(out.data))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = ctx.nand(out, b)
            np.asarray(jax.device_get(out.data))
            times.append((time.perf_counter() - t0) / iters)
        dt = sorted(times)[1]
        want = list(bits0)
        for _ in range(1 + 3 * iters):
            want = [1 - (x & y) for x, y in zip(want, bits1)]
        errors = int(np.sum(decrypt_bits(out, sk) != np.array(want)))
        rows.append({"cfg": cfg or {"default": 1},
                     "gates_per_sec": round(batch / dt, 1),
                     "ms_per_batch": round(dt * 1e3, 2),
                     "errors": errors})
        print(json.dumps(rows[-1]), flush=True)
    best = max(rows, key=lambda r: r["gates_per_sec"])
    print(json.dumps({"best": best, "batch": batch, "params": pname}))


if __name__ == "__main__":
    main()
