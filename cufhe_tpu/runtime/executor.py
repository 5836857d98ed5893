"""Schedule executor: runs a compiled circuit level-by-level on a Context.

Each (level, opcode) group becomes ONE batched gate program over
[n_gates * B] ciphertexts: wires are gathered from a device-resident register
file, evaluated in a single fused XLA call, and scattered back. This realizes
on the batch axis the concurrency the reference gets from one-CUDA-block-per-
gate across streams (reference cufhe_gpu.cuh:152-189), with the level
schedule guaranteeing dependence-safety (the reference's StreamQuery polling
loop, test_intensive.cc:21-54, done statically by the native scheduler).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..models.api import Context, Ctxt
from .graph import Schedule

U32 = jnp.uint32


def trivial_ciphertext(value: int, dim: int, mu: int, batch: int) -> jnp.ndarray:
    """Noiseless public ciphertext of a constant bit: a = 0, b = ±mu.
    (TFHE 'trivial sample'; decrypts to `value` under any key.)"""
    b = np.uint32(mu if value else (-mu) % (1 << 32))
    ct = np.zeros((batch, dim + 1), dtype=np.uint32)
    ct[:, dim] = b
    return jnp.asarray(ct)


def run_schedule(ctx: Context, sched: Schedule,
                 inputs: Sequence[Ctxt], level: int = 0) -> List[Ctxt]:
    """Execute a compiled circuit. inputs[i] feeds sched.inputs[i]; every
    input batch must share shape [B, dim+1]. Returns output Ctxts in
    declaration order."""
    if len(inputs) != len(sched.inputs):
        raise ValueError(f"circuit has {len(sched.inputs)} inputs, "
                         f"got {len(inputs)}")
    if not inputs and not sched.consts:
        return []
    if inputs:
        B, width = inputs[0].data.shape
        lvl = inputs[0].level
        for ct in inputs:
            if ct.data.shape != (B, width) or ct.level != lvl:
                raise ValueError("all inputs must share shape and level")
    else:
        raise ValueError("constant-only circuits need at least one input "
                         "to define the batch shape")
    mu = ctx.params.lvl0.mu if lvl == 0 else ctx.params.lvl1.mu

    # register file [num_wires, B, width] on device
    regs = jnp.zeros((sched.num_wires, B, width), dtype=U32)
    for wire, ct in zip(sched.inputs, inputs):
        regs = regs.at[wire].set(ct.data)
    for wire, val in sched.consts.items():
        regs = regs.at[wire].set(trivial_ciphertext(val, width - 1, mu, B))

    for groups in sched.levels:
        # gather → one fused batched call per opcode → scatter
        updates = []
        for opname, quads in groups:
            outs = jnp.asarray([q[0] for q in quads], dtype=jnp.int32)
            ga = regs[jnp.asarray([q[1] for q in quads])]  # [L, B, width]
            L = ga.shape[0]
            flat = lambda x: x.reshape(L * B, width)
            unflat = lambda x: x.reshape(L, B, width)
            if opname in ("not", "copy"):
                a = Ctxt(flat(ga), lvl)
                res = ctx.not_(a) if opname == "not" else ctx.copy(a)
            elif opname in ("mux", "nmux"):
                gb = regs[jnp.asarray([q[2] for q in quads])]
                gc = regs[jnp.asarray([q[3] for q in quads])]
                res = ctx.mux(Ctxt(flat(ga), lvl), Ctxt(flat(gb), lvl),
                              Ctxt(flat(gc), lvl), negate=(opname == "nmux"))
            else:
                gb = regs[jnp.asarray([q[2] for q in quads])]
                res = ctx.gate(opname, Ctxt(flat(ga), lvl),
                               Ctxt(flat(gb), lvl))
            updates.append((outs, unflat(res.data)))
        for outs, vals in updates:
            regs = regs.at[outs].set(vals)

    return [Ctxt(regs[w], lvl) for w in sched.outputs]
