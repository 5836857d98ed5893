"""Headline benchmark: batched NAND gate bootstraps/sec/chip at the
TFHEpp 128-bit parameter set (the reference's headline metric; cuFHE
README.md:29-31 reports 13 ms/gate single-stream on A100, ≈8300 gates/s
batched across 108 SMs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the derived A100 batched throughput (8300/s,
BASELINE.md).

Capture hardening (rounds 2 and 4 both lost the official capture to
mid-run tunnel/link outages):
  * the measurement runs in a killable child under a wall-clock watchdog
    (BENCH_RUN_BUDGET_S, default 1500 s);
  * the watchdog RETRIES the child with the remaining budget instead of
    giving up on the first hang/crash;
  * the child writes a heartbeat artifact after EVERY completed rep, so
    a late drop still yields a real (flagged "partial": true) number;
  * a persistent XLA compilation cache (.jax_cache/) makes warm restarts
    skip the multi-minute Pallas compiles.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_METRIC = "nand_gate_bootstraps_per_sec_per_chip"
_BASELINE = 8300.0  # derived A100 batched gates/s (BASELINE.md)


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _error_line(error: str, detail: str, **extra) -> dict:
    out = {"metric": _METRIC, "error": error, "detail": detail,
           "value": None, "unit": "gates/s", "vs_baseline": None}
    out.update(extra)
    return out


def _wait_for_device() -> None:
    """Ride out transient TPU-link outages before committing this process
    to backend init (init can HANG, not just raise, while the forwarded
    link is down — so probe in a killable subprocess first).

    The TOTAL probe budget is hard-capped (default 180 s, env
    BENCH_INIT_BUDGET_S) so an outage cannot consume the capture window;
    on exhaustion we record a structured error artifact and exit — the
    parent watchdog decides whether to retry with its remaining budget."""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return  # smoke mode: no TPU link involved
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
    _emit_child_result(_error_line(
        "device_down",
        f"TPU link unreachable after {probes} probes / {budget:.0f} s"))
    sys.exit(0)


def _emit_child_result(line: dict) -> None:
    """Deliver the child's final JSON: to the result file when the parent
    watchdog is supervising (it prints exactly one line), else stdout."""
    path = os.environ.get("_BENCH_RESULT_FILE")
    if path:
        _write_json_atomic(path, line)
    else:
        print(json.dumps(line))


def _watchdog() -> None:
    """Hard wall-clock cap + retry on the WHOLE run. A link that drops
    mid-measurement hangs the process inside a jax call (rounds 2 and 4
    lost their official captures to exactly this). Re-run ourselves as a
    killable child; on hang/crash retry with the remaining budget; if the
    budget runs dry, publish the child's best-rep-so-far heartbeat as a
    partial result rather than a null."""
    if os.environ.get("_BENCH_CHILD") == "1":
        return
    import subprocess
    budget = float(os.environ.get("BENCH_RUN_BUDGET_S", "1500"))
    deadline = time.monotonic() + budget
    result_path = os.path.join(_REPO, ".bench_result.json")
    hb_path = os.path.join(_REPO, ".bench_heartbeat.json")
    for p in (result_path, hb_path):
        try:
            os.remove(p)
        except OSError:
            pass
    env = dict(os.environ, _BENCH_CHILD="1", _BENCH_RESULT_FILE=result_path,
               _BENCH_HEARTBEAT_FILE=hb_path)
    attempt = 0
    # Cold-path reality on the tunnel (measured): ~110 s keys+upload,
    # ~810 s first compile, ~40 s reps => ~960 s. The first attempt must
    # be able to ride that out, so reserve only a short retry window
    # (a retry is cheap when the compile cache is warm, and the per-rep
    # heartbeat already salvages a late hang as a partial result).
    reserve = float(os.environ.get("_BENCH_RETRY_RESERVE_S", "300"))
    min_left = min(90., reserve / 4)
    last_error, last_detail = "no_attempt", "watchdog budget too small"
    while deadline - time.monotonic() >= min_left:
        attempt += 1
        remaining = deadline - time.monotonic()
        slice_s = max(remaining - reserve, min(remaining, 2 * reserve))
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=slice_s).returncode
        except subprocess.TimeoutExpired:
            last_error, last_detail = "run_timeout", (
                f"attempt {attempt} exceeded its {slice_s:.0f} s slice "
                "(link drop mid-run?)")
            print(last_detail, file=sys.stderr)
            continue
        res = _read_json(result_path)
        if res is not None and res.get("value") is not None:
            res["attempts"] = attempt
            print(json.dumps(res))
            sys.exit(0)
        last_error = (res or {}).get("error") or f"child_rc_{rc}"
        last_detail = (res or {}).get("detail") or (
            f"attempt {attempt} exited rc={rc} without a result")
        print(f"attempt {attempt} failed ({last_error}); "
              f"{deadline - time.monotonic():.0f} s of budget left",
              file=sys.stderr)
        time.sleep(min(10, max(0, deadline - time.monotonic() - min_left)))
    hb = _read_json(hb_path)
    if hb is not None and hb.get("value"):
        hb.update(partial=True, attempts=attempt,
                  error=last_error, detail=last_detail)
        print(json.dumps(hb))
    else:
        print(json.dumps(_error_line(last_error, last_detail,
                                     attempts=attempt)))
    sys.exit(0)


def main() -> None:
    _watchdog()
    _wait_for_device()
    # Persistent compilation cache: warm restarts (watchdog retries, later
    # rounds) skip the multi-minute Pallas/XLA compiles. Must be set before
    # the first compilation; failures are non-fatal by default. compcache
    # also makes the cache key survive tunnel reconnects (a reconnect can
    # land on a differently-built backend server, which the stock key
    # hashes — four same-day runs of this very program wrote four distinct
    # cache entries before this fix).
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin ignores the env var alone; force in-process
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, _REPO)
    from cufhe_tpu.utils import compcache
    compcache.enable(explain_misses=True)

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
    hb_path = os.environ.get("_BENCH_HEARTBEAT_FILE")

    cache = os.path.join(_REPO, f".bench_keys_{pname}.npz" if pname
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

    # warmup/compile (device_get forces real completion; block_until_ready
    # is not reliable for timing through the axon tunnel)
    out = ctx.nand(a, b)
    np.asarray(jax.device_get(out.data))
    gates_done = 1
    if fused:
        out = ctx.gate_chain("nand", out, b, iters)
        np.asarray(jax.device_get(out.data))
        gates_done += iters

    def expected_bits(n_gates: int) -> np.ndarray:
        want = np.asarray(bits0)
        for _ in range(n_gates):
            want = 1 - (want & bits1)
        return want

    def result_line(med_dt: float, reps_done: int, errors: int) -> dict:
        rate = batch / med_dt
        return {
            "metric": _METRIC,
            "value": round(rate, 2),
            "unit": "gates/s",
            "vs_baseline": round(rate / _BASELINE, 4),
            "batch": batch,
            "ms_per_batch": round(med_dt * 1e3, 2),
            "backend": backend,
            "fused_chain": fused,
            "params": pname or "tfhepp_128bit",
            "reps": reps_done,
            "decrypt_errors": errors,
            "device": str(jax.devices()[0]),
        }

    # 5 reps ≈ +20 s; the shared chip's run-to-run variance is the largest
    # error term left now that warm starts hit the compile cache (~5 min
    # total against the 1500 s budget), so buy a sturdier median.
    reps = int(os.environ.get("BENCH_REPS", "5"))
    times: list[float] = []
    for r in range(reps):   # median over reps: shared-chip variance ~5-10%
        t0 = time.perf_counter()
        if fused:
            out = ctx.gate_chain("nand", out, b, iters)
        else:
            for _ in range(iters):
                out = ctx.nand(out, b)  # chain on outputs: device-resident
        host_out = np.asarray(jax.device_get(out.data))
        times.append((time.perf_counter() - t0) / iters)
        gates_done += iters
        if hb_path:
            # Partial artifact: decrypt-check + best-so-far median after
            # every rep, so a late link drop still yields a real number.
            errs = int(np.sum(
                G.decrypt_bit_batch(host_out, sk, level=out.level)
                != expected_bits(gates_done)))
            med = sorted(times)[len(times) // 2]
            _write_json_atomic(hb_path, result_line(med, r + 1, errs))
            if os.environ.get("_BENCH_HANG_AFTER_REP") == str(r + 1):
                time.sleep(1e6)  # test hook: simulate a mid-run link hang
    dt = sorted(times)[len(times) // 2]

    # correctness spot check on the last output
    got = decrypt_bits(out, sk)
    errors = int(np.sum(got != expected_bits(gates_done)))

    _emit_child_result(result_line(dt, reps, errors))


if __name__ == "__main__":
    main()
