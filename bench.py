"""Headline benchmark: batched NAND gate bootstraps/sec/chip at the
TFHEpp 128-bit parameter set (the reference's headline metric; cuFHE
README.md:29-31 reports 13 ms/gate single-stream on A100, ≈8300 gates/s
batched across 108 SMs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the derived A100 batched throughput (8300/s,
BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _wait_for_device() -> None:
    """Ride out transient TPU-link outages before committing this process
    to backend init (init can HANG, not just raise, while the forwarded
    link is down — so probe in a killable subprocess first).

    The TOTAL probe budget is hard-capped (default 180 s, env
    BENCH_INIT_BUDGET_S) so an outage cannot consume the driver's capture
    window; on exhaustion we emit a structured JSON error line on stdout
    and exit 0 — a parseable artifact beats a bare rc=124."""
    import subprocess
    budget = float(os.environ.get("BENCH_INIT_BUDGET_S", "180"))
    deadline = time.monotonic() + budget
    probes = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 5:
            break
        probes += 1
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=min(90, remaining), capture_output=True)
            if probe.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 15:
            break
        print(f"device link down (probe {probes}, {remaining:.0f} s of "
              "budget left); retrying in 15 s", file=sys.stderr)
        time.sleep(15)
    print(json.dumps({
        "metric": "nand_gate_bootstraps_per_sec_per_chip",
        "error": "device_down",
        "detail": f"TPU link unreachable after {probes} probes / "
                  f"{budget:.0f} s budget",
        "value": None, "unit": "gates/s", "vs_baseline": None,
    }))
    sys.exit(0)


def _watchdog() -> None:
    """Hard wall-clock cap on the WHOLE run: the startup probe catches a
    link that is already down, but a link that drops mid-measurement hangs
    the process inside a jax call (round 2 lost its official capture to
    exactly this: rc=124, no artifact). Re-run ourselves as a killable
    child; on expiry emit the structured error line and exit 0."""
    if os.environ.get("_BENCH_CHILD") == "1":
        return
    import subprocess
    budget = float(os.environ.get("BENCH_RUN_BUDGET_S", "1500"))
    env = dict(os.environ, _BENCH_CHILD="1")
    try:
        rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                            env=env, timeout=budget).returncode
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "nand_gate_bootstraps_per_sec_per_chip",
            "error": "run_timeout",
            "detail": f"measurement exceeded {budget:.0f} s wall-clock "
                      "budget (link drop mid-run?)",
            "value": None, "unit": "gates/s", "vs_baseline": None,
        }))
        sys.exit(0)
    sys.exit(rc)


def main() -> None:
    _watchdog()
    _wait_for_device()
    import jax

    from cufhe_tpu import PRESETS, TFHEPP_128, golden as G
    from cufhe_tpu.models import Context, encrypt_bits, decrypt_bits
    from cufhe_tpu.utils import serialization as S

    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    # Chain depth per timed rep. Gates chain device-resident (the
    # reference's g-gate model, cufhe_gates_gpu.cu:161-167) and the final
    # D2H readback (~10 MB through the tunnel, ~60 ms) plus the ~30 ms
    # per-sync tunnel round trip are amortized over the chain — matching
    # the reference's headline, which times kernels with cudaEvents and
    # keeps ciphertexts on device between gates. 20 deep costs ~4.5 ms/gate
    # of boundary overhead less than 10 deep and stresses noise harder
    # (every rep decrypt-checked).
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    pname = os.environ.get("BENCH_PARAMS", "")

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_keys_{pname}.npz" if pname
                         else ".bench_keys_128.npz")
    sk_cache = cache.replace("keys", "sk")
    ek = sk = None
    if os.path.exists(cache) and os.path.exists(sk_cache):
        try:
            ek = S.load_eval_key(cache)
            sk = S.load_secret_key(sk_cache)
        except ValueError as e:   # params-fingerprint mismatch: regenerate
            print(f"stale key cache ({e}); regenerating", file=sys.stderr)
            ek = sk = None        # a half-loaded pair must not survive
    if ek is None:
        print("generating 128-bit keys (one-time)...", file=sys.stderr)
        sk = G.keygen(PRESETS[pname] if pname else TFHEPP_128, seed=0)
        ek = G.make_eval_key(sk, seed=1)
        S.save_eval_key(cache, ek)
        S.save_secret_key(sk_cache, sk)

    ctx = Context(ek, backend=backend)
    rng = np.random.default_rng(7)
    bits0 = rng.integers(0, 2, batch)
    bits1 = rng.integers(0, 2, batch)
    a = encrypt_bits(bits0, sk, rng)
    b = encrypt_bits(bits1, sk, rng)

    # BENCH_FUSED=1 runs each timed chain as ONE compiled program
    # (Context.gate_chain, lax.scan over the bootstrap): one dispatch per
    # chain instead of per gate, removing the per-enqueue tunnel tax from
    # the measurement. Bit-identical gates either way.
    fused = os.environ.get("BENCH_FUSED", "0") == "1"

    # warmup/compile (device_get forces real completion; block_until_ready is
    # not reliable for timing through the axon tunnel)
    out = ctx.nand(a, b)
    np.asarray(jax.device_get(out.data))
    if fused:
        out = ctx.gate_chain("nand", out, b, iters)
        np.asarray(jax.device_get(out.data))

    reps = int(os.environ.get("BENCH_REPS", "3"))
    times = []
    for r in range(reps):   # median over reps: shared-chip variance ~5-10%
        t0 = time.perf_counter()
        if fused:
            out = ctx.gate_chain("nand", out, b, iters)
        else:
            for _ in range(iters):
                out = ctx.nand(out, b)  # chain on outputs: device-resident
        np.asarray(jax.device_get(out.data))
        times.append((time.perf_counter() - t0) / iters)
    dt = sorted(times)[len(times) // 2]
    gates_per_sec = batch / dt

    # correctness spot check on the last output (fused mode ran one extra
    # warmup chain of `iters` gates)
    total_gates = reps * iters + 1 + (iters if fused else 0)
    want = list(bits0)
    for _ in range(total_gates):
        want = [1 - (x & y) for x, y in zip(want, bits1)]
    got = decrypt_bits(out, sk)
    errors = int(np.sum(got != np.array(want)))

    baseline = 8300.0  # derived A100 batched gates/s (BASELINE.md)
    print(json.dumps({
        "metric": "nand_gate_bootstraps_per_sec_per_chip",
        "value": round(gates_per_sec, 2),
        "unit": "gates/s",
        "vs_baseline": round(gates_per_sec / baseline, 4),
        "batch": batch,
        "ms_per_batch": round(dt * 1e3, 2),
        "backend": backend,
        "fused_chain": fused,
        "params": pname or "tfhepp_128bit",
        "decrypt_errors": errors,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
