"""Multi-device scaling harness (the test_gate_gpu_multi.cc analogue).

Two measurements, stored as JSON lines in benchmarks/results.jsonl:

1. CPU-mesh correctness sweep: the sharded gate program (shard_map over a
   1/2/4/8-device mesh, production Pallas backend in interpret mode) is
   bit-identical to the unsharded program at every device count, and its
   compiled HLO contains zero collective ops. This is the *mechanism* proof:
   per-chip work is independent, so cross-chip scaling efficiency is bounded
   only by host feeding, not by communication.

2. Real-chip sharding overhead: the flagship TFHEpp-128 NAND program run
   plain vs wrapped in shard_map over a 1-device mesh on the TPU. The
   shard_map wrap is what a multi-chip deployment executes on each chip;
   identical throughput = zero sharding overhead = per-chip rate multiplies
   across a slice (keys replicated, no collectives — SURVEY.md §2).

Run: python benchmarks/scaling.py [--cpu-only]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "collective-permute",
               "reduce-scatter")
RESULTS = os.path.join(REPO, "benchmarks", "results.jsonl")


def log(rec: dict) -> None:
    rec = {"bench": "scaling", **rec}
    print(json.dumps(rec))
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def cpu_mesh_sweep() -> None:
    """Sharded == unsharded at 1,2,4,8 devices; zero collectives in HLO."""
    env = os.environ.copy()
    code = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import json
import numpy as np
from cufhe_tpu import golden as G
from cufhe_tpu import params as P
from cufhe_tpu.ops import bootstrap as B, keys as K
from cufhe_tpu.parallel.mesh import data_mesh, data_parallel
from jax.sharding import NamedSharding, PartitionSpec

params = P.PALLAS_TINY
sk = G.keygen(params, seed=21)
ek = G.make_eval_key(sk, seed=22)
keys = K.prepare_keys(ek, backends=("pallas",))
rng = np.random.default_rng(23)
Bn = 16
mk = lambda: np.stack([G.encrypt_bit(int(v), sk, rng)
                       for v in rng.integers(0, 2, Bn)])
a_np, b_np = mk(), mk()
fn = lambda x, y, k: B.gate_lvl0(G.GATE_CONSTANTS["nand"], x, y, k, params,
                                 backend="pallas")
ref = np.asarray(jax.jit(fn)(a_np, b_np, keys))
out = []
for nd in (1, 2, 4, 8):
    mesh = data_mesh(n_devices=nd)
    repl = NamedSharding(mesh, PartitionSpec())
    shard = NamedSharding(mesh, PartitionSpec("data"))
    kd = jax.device_put(keys, repl)
    a = jax.device_put(a_np, shard)
    b = jax.device_put(b_np, shard)
    prog = jax.jit(data_parallel(fn, mesh, (0, 1)))
    got = prog(a, b, kd)
    hlo = prog.lower(a, b, kd).compile().as_text()
    colls = [c for c in %r if c in hlo]
    out.append({"devices": nd,
                "bit_exact": bool(np.array_equal(np.asarray(got), ref)),
                "collectives": colls,
                "out_devices": len(got.sharding.device_set)})
print("RESULT " + json.dumps(out))
""" % (COLLECTIVES,)
    import subprocess
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
    if not line:
        print(r.stdout, r.stderr, file=sys.stderr)
        raise RuntimeError("cpu mesh sweep failed")
    rows = json.loads(line[0][len("RESULT "):])
    ok = all(row["bit_exact"] and not row["collectives"] and
             row["out_devices"] == row["devices"] for row in rows)
    log({"metric": "cpu_mesh_sweep", "rows": rows, "pass": ok})
    if not ok:
        raise SystemExit("cpu mesh sweep FAILED: " + json.dumps(rows))


def _force(x):
    import jax
    return np.asarray(jax.device_get(x))


def tpu_sharding_overhead(batch: int = 4096, iters: int = 5) -> None:
    """Flagship program plain vs shard_map(1-device mesh) on the real chip."""
    import jax

    if jax.default_backend() != "tpu":
        print("no TPU available; skipping real-chip overhead check",
              file=sys.stderr)
        return

    from cufhe_tpu import TFHEPP_128, golden as G
    from cufhe_tpu.ops import bootstrap as B
    from cufhe_tpu.models import Context, encrypt_bits
    from cufhe_tpu.parallel.mesh import data_mesh, data_parallel
    from cufhe_tpu.utils import serialization as S
    from jax.sharding import NamedSharding, PartitionSpec

    cache = os.path.join(REPO, ".bench_keys_128.npz")
    sk_cache = cache.replace("keys", "sk")
    if not (os.path.exists(cache) and os.path.exists(sk_cache)):
        print("generating 128-bit keys (one-time)...", file=sys.stderr)
        sk = G.keygen(TFHEPP_128, seed=0)
        ek = G.make_eval_key(sk, seed=1)
        S.save_eval_key(cache, ek)
        S.save_secret_key(sk_cache, sk)
    else:
        ek = S.load_eval_key(cache)
        sk = S.load_secret_key(sk_cache)

    ctx = Context(ek)
    rng = np.random.default_rng(7)
    a = encrypt_bits(rng.integers(0, 2, batch), sk, rng)
    b = encrypt_bits(rng.integers(0, 2, batch), sk, rng)
    p = ek.params
    c3 = B.encode_gate_consts(G.GATE_CONSTANTS["nand"], p.lvl0.mu)

    def gate(c, x, y, keys):
        return B.gate_lvl0(c, x, y, keys=keys, params=p, backend="auto")

    def run(prog, a_d, b_d, keys):
        out = prog(c3, a_d, b_d, keys)
        _force(out)                       # compile+warm
        reps = []
        for _ in range(3):                # medians: tunnel variance ~5-10%
            t0 = time.perf_counter()
            for _ in range(iters):        # amortize host sync like bench.py
                out = prog(c3, out, b_d, keys)
            _force(out)
            reps.append((time.perf_counter() - t0) / iters)
        return batch / float(np.median(reps))

    plain = run(jax.jit(gate), a.data, b.data, ctx.keys)

    mesh = data_mesh(n_devices=1)
    shard = NamedSharding(mesh, PartitionSpec("data"))
    repl = NamedSharding(mesh, PartitionSpec())
    keys_m = jax.device_put(ctx.keys, repl)
    a_m = jax.device_put(a.data, shard)
    b_m = jax.device_put(b.data, shard)
    prog_m = jax.jit(data_parallel(gate, mesh, (1, 2)))
    hlo = prog_m.lower(c3, a_m, b_m, keys_m).compile().as_text()
    colls = [c for c in COLLECTIVES if c in hlo]
    sharded = run(prog_m, a_m, b_m, keys_m)

    overhead = 1.0 - sharded / plain
    log({"metric": "tpu_shardmap_overhead", "batch": batch,
         "plain_gates_per_sec": round(plain, 1),
         "sharded_gates_per_sec": round(sharded, 1),
         "overhead_frac": round(overhead, 4),
         "collectives": colls,
         "scaling_efficiency_projection": round(sharded / plain, 4)})


if __name__ == "__main__":
    cpu_mesh_sweep()
    if "--cpu-only" not in sys.argv:
        tpu_sharding_overhead()
