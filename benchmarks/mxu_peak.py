"""MXU peak probe: what int8 dot throughput is actually reachable on this
chip through XLA and through Mosaic?

The fused blind rotation spends ~93% of its device time in int8 dot_generals
(phase accounting in docs/DESIGN.md). A prior in-Pallas microbench measured
~189 TMAC/s for the kernel's dot shape — 96% of the bf16 rate (197), not of
the chip's nominal int8 rate (~394 TOPS on v5e). This probe establishes,
per path, the best sustained rate for large int8 matmuls so the kernel's
efficiency is judged against a *demonstrated* ceiling rather than a spec
sheet:

  * xla-int8:   jnp.dot int8 x int8 -> int32 (XLA picks the MXU mode)
  * xla-int8-bf16acc: int8 inputs cast to bf16, f32 accum (control)
  * xla-bf16:   bf16 x bf16 -> f32 (the documented 197 TFLOP/s rate)
  * pallas-int8: the blind-rotation kernel's dot shape inside a Mosaic
    kernel, many independent dots per grid step (no VPU work at all)

Run on the real TPU: python benchmarks/mxu_peak.py
Prints one JSON line per config with achieved TMAC/s.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin ignores the env var; force CPU before backend init
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _force(x):
    return np.asarray(jax.device_get(x))


def timed(fn, *args, reps=5, inner=4):
    red = jax.jit(lambda y: jnp.sum(y.astype(jnp.int32)))
    _force(red(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _force(red(out))
        ts.append((time.perf_counter() - t0) / inner)
    return sorted(ts)[len(ts) // 2]


SMALL = os.environ.get("MXU_PEAK_SMALL") == "1"   # CPU smoke test


def xla_cases(rng):
    M = K = N = 256 if SMALL else 8192
    a8 = jnp.asarray(rng.integers(-100, 100, (M, K), dtype=np.int64)
                     .astype(np.int8))
    b8 = jnp.asarray(rng.integers(-100, 100, (K, N), dtype=np.int64)
                     .astype(np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)
    macs = float(M) * K * N

    @jax.jit
    def dot_i8(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def dot_i8_bfacc(a, b):
        # int8 operands, cast inside the timed program: measures whether
        # XLA fuses the upcast and runs the MXU at the bf16 rate
        return jax.lax.dot_general(a.astype(jnp.bfloat16),
                                   b.astype(jnp.bfloat16),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def dot_bf(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    yield "xla-int8", dot_i8, (a8, b8), macs
    yield "xla-int8-bf16acc", dot_i8_bfacc, (a8, b8), macs
    yield "xla-bf16", dot_bf, (abf, bbf), macs

    # the blind-rotation kernel's exact dot shape through plain XLA
    # (batched): if this reaches the int8 peak where Mosaic does not, a
    # hybrid (pallas rot/dec + XLA dots) is worth building
    S, M, K, W = (2, 256, 256, 128) if SMALL else (18, 2048, 1536, 512)
    A = jnp.asarray(rng.integers(-100, 100, (S, M, K), dtype=np.int64)
                    .astype(np.int8))
    X = jnp.asarray(rng.integers(-32, 32, (S, K, W), dtype=np.int64)
                    .astype(np.int8))

    @jax.jit
    def dot_i8_kshape(a, x):
        return jax.lax.dot_general(
            a, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    yield "xla-int8-kshape", dot_i8_kshape, (A, X), float(S) * M * K * W


def pallas_case(rng, variant, M=2048, K=1536, W=512, S=18, steps=32):
    """S independent dots of the blind-rotation shape per grid step.
    Mirrors ops/pallas_br.py's dot() (M=GOL*leaf_n, K=I*leaf_n, W=lanes).

    variant selects what runs besides the dots, isolating which in-kernel
    companion work breaks the pure-dot rate:
      'pure'  — operands pre-resident in VMEM, one summed store at the end
      'place' — each dot's int32 result immediately shifted/accumulated on
                the VPU into a scratch update buffer (the kernel's place())
      'write' — between dots, the NEXT dot's operand buffer is overwritten
                from a staging ref (the kernel's build() writes to a_ref,
                minus the shear arithmetic)
    """
    if SMALL:
        M, K, W, S, steps = 256, 256, 128, 2, 2
    dt = jnp.bfloat16 if variant == "bf16" else jnp.int8
    acc_t = jnp.float32 if variant == "bf16" else jnp.int32
    A = jnp.asarray(rng.integers(-100, 100, (S, M, K), dtype=np.int64)
                    .astype(np.int8)).astype(dt)
    X = jnp.asarray(rng.integers(-32, 32, (S, K, W), dtype=np.int64)
                    .astype(np.int8)).astype(dt)
    NBUF = min(3, S)

    def kernel(a_ref, x_ref, o_ref, upd_ref):
        def body(i, c):
            if variant in ("pure", "bf16"):
                acc = jnp.zeros((M, W), acc_t)
                for s in range(S):
                    acc += jax.lax.dot_general(
                        a_ref[s], x_ref[s], (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t)
                o_ref[...] = acc.astype(jnp.int32)
            else:                               # 'place'
                pending = None
                for s in range(S):
                    p32 = jax.lax.dot_general(
                        a_ref[s], x_ref[s], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    if pending is not None:
                        upd_ref[...] += (pending.astype(jnp.uint32)
                                         << np.uint32(8))
                    pending = p32
                upd_ref[...] += pending.astype(jnp.uint32)
                o_ref[...] = upd_ref[...].astype(jnp.int32)
            return c
        jax.lax.fori_loop(0, steps, body, 0)

    if variant == "write":
        def kernel(a_ref, st_ref, x_ref, o_ref, upd_ref):  # noqa: F811
            def body(i, c):
                acc = jnp.zeros((M, W), jnp.int32)
                for s in range(S):
                    acc += jax.lax.dot_general(
                        a_ref[s % NBUF], x_ref[s],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    a_ref[(s + 1) % NBUF] = st_ref[(s + 1) % S]
                o_ref[...] = acc
                return c
            jax.lax.fori_loop(0, steps, body, 0)

        @jax.jit
        def run(a, x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, W), jnp.int32),
                scratch_shapes=[pltpu.VMEM((M, W), jnp.uint32)],
                interpret=jax.default_backend() != "tpu",
            )(a[:NBUF], a, x)
    else:
        @jax.jit
        def run(a, x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, W), jnp.int32),
                scratch_shapes=[pltpu.VMEM((M, W), jnp.uint32)],
                interpret=jax.default_backend() != "tpu",
            )(a, x)

    macs = float(M) * K * W * S * steps
    return f"pallas-{variant}-w{W}", run, (A, X), macs


def main():
    rng = np.random.default_rng(7)
    cases = list(xla_cases(rng)) + [pallas_case(rng, v)
                                    for v in ("pure", "place", "write",
                                              "bf16")]
    # the plain (unstaggered) schedule's dot shape: full 1024-lane tile
    cases.append(pallas_case(rng, "pure", W=1024, S=9))
    for name, fn, args, macs in cases:
        try:
            t = timed(fn, *args)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"case": name, "error": str(e)[:200]}))
            continue
        print(json.dumps({
            "case": name, "sec": round(t, 4),
            "tmacs_per_sec": round(macs / t / 1e12, 1),
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    main()
