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


def _bucket(n: int) -> int:
    """Pad a level's fused gate count to a shape bucket: exact for tiny
    levels, multiples of 64 up to 1024, powers of two beyond — bounds the
    number of distinct compiled programs (compiles are ~20-40s through the
    TPU tunnel) at <=10% padded bootstrap waste for AES-scale netlists."""
    if n <= 16:
        return n
    if n <= 1024:
        return -(-n // 64) * 64
    return 1 << (n - 1).bit_length()


def allocate_slots(sched: Schedule) -> Dict[int, int]:
    """Liveness-based register allocation: wire -> physical slot.

    The dense [num_wires, B, width] register file does not scale (a Bristol
    AES-128 netlist is ~36k wires; at B=1024 that is ~90 GB). The scheduler
    already levelizes, so a wire's slot can be recycled after the level of
    its last read: within one executed level every gather happens before any
    scatter (run_schedule builds all updates, then writes), making it safe
    for a level's outputs to reuse slots freed by that same level's operand
    reads. Returns the wire->slot map; the register file needs
    max(slot)+1 = peak-liveness slots instead of num_wires.
    """
    last_read: Dict[int, int] = {}
    for lvl, groups in enumerate(sched.levels, start=1):
        for _, quads in groups:
            for q in quads:
                for w in q[1:]:
                    if w >= 0:
                        last_read[w] = lvl
    for w in sched.outputs:
        last_read[w] = len(sched.levels) + 1   # outputs live to the end

    expire: Dict[int, List[int]] = {}
    for w, lvl in last_read.items():
        expire.setdefault(lvl, []).append(w)

    slot: Dict[int, int] = {}
    free: List[int] = []
    hi = 0

    def alloc(w: int) -> None:
        nonlocal hi
        if w in slot:
            return
        if free:
            slot[w] = free.pop()
        else:
            slot[w] = hi
            hi += 1

    for w in sched.inputs:
        alloc(w)
    for w in sched.consts:
        alloc(w)
    for lvl, groups in enumerate(sched.levels, start=1):
        # operands of this level whose last read is here release their
        # slots to this level's outputs (reads precede writes per level)
        for w in expire.get(lvl, ()):  # may include not-yet-dead outputs? no:
            if w in slot:              # defined earlier => slot assigned
                free.append(slot[w])
        for _, quads in groups:
            for q in quads:
                alloc(q[0])
    return slot


def simulate_schedule(sched: Schedule,
                      inputs: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Plaintext (cleartext-bit) execution of a compiled circuit — the
    oracle for encrypted runs (the reference's plain.h truth-table model,
    test/plain.h:10-69, applied to whole netlists). inputs[i] is a bit
    array feeding sched.inputs[i]; arrays broadcast together (batch)."""
    from ..golden import PLAIN_GATES

    vals: Dict[int, np.ndarray] = {}
    for w, bits in zip(sched.inputs, inputs):
        vals[w] = np.asarray(bits).astype(np.int64)
    for w, v in sched.consts.items():
        vals[w] = np.int64(v)
    for groups in sched.levels:
        for opname, quads in groups:
            if opname in ("mux", "nmux"):  # PLAIN_GATES mux is scalar-only
                for q in quads:
                    sel = np.where(vals[q[1]] == 1, vals[q[2]], vals[q[3]])
                    vals[q[0]] = (1 - sel) if opname == "nmux" else sel
                continue
            fn = PLAIN_GATES[opname]
            for q in quads:
                args = [vals[a] for a in q[1:] if a >= 0]
                vals[q[0]] = fn(*args)
    return [vals[w] for w in sched.outputs]


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

    # register file [num_slots, B, width] on device; slots recycle after a
    # wire's last read (peak liveness, not wire count — AES-scale netlists
    # would otherwise need ~90 GB)
    slot = allocate_slots(sched)
    num_slots = max(slot.values()) + 1 if slot else 1
    regs = jnp.zeros((num_slots, B, width), dtype=U32)
    for wire, ct in zip(sched.inputs, inputs):
        regs = regs.at[slot[wire]].set(ct.data)
    for wire, val in sched.consts.items():
        regs = regs.at[slot[wire]].set(
            trivial_ciphertext(val, width - 1, mu, B))

    from ..golden import GATE_CONSTANTS
    two_input = {n for n in GATE_CONSTANTS
                 if n not in ("not", "copy", "mux", "nmux")}

    for groups in sched.levels:
        # gather → fused batched calls → scatter. ALL two-input gates of a
        # level (any mix of the ten ops) run as ONE program via per-row
        # gate constants; the gate count is bucket-padded so large netlists
        # reuse a handful of compiled shapes instead of one per level.
        updates = []
        fused_quads: List[tuple] = []
        fused_names: List[str] = []
        for opname, quads in groups:
            if opname in two_input:
                fused_quads.extend(quads)
                fused_names.extend([opname] * len(quads))
                continue
            outs = jnp.asarray([slot[q[0]] for q in quads], dtype=jnp.int32)
            ga = regs[jnp.asarray([slot[q[1]] for q in quads])]  # [L,B,width]
            L = ga.shape[0]
            flat = lambda x: x.reshape(L * B, width)
            unflat = lambda x: x.reshape(L, B, width)
            if opname in ("not", "copy"):
                a = Ctxt(flat(ga), lvl)
                res = ctx.not_(a) if opname == "not" else ctx.copy(a)
            else:  # mux / nmux
                gb = regs[jnp.asarray([slot[q[2]] for q in quads])]
                gc = regs[jnp.asarray([slot[q[3]] for q in quads])]
                res = ctx.mux(Ctxt(flat(ga), lvl), Ctxt(flat(gb), lvl),
                              Ctxt(flat(gc), lvl), negate=(opname == "nmux"))
            updates.append((outs, unflat(res.data)))
        if fused_quads:
            G = len(fused_quads)
            Gp = _bucket(G)
            pad = Gp - G
            quads_p = fused_quads + [fused_quads[0]] * pad
            names_p = fused_names + [fused_names[0]] * pad
            from ..ops.bootstrap import encode_gate_consts_rows
            c3 = encode_gate_consts_rows(names_p, mu)      # [Gp, 3]
            ga = regs[jnp.asarray([slot[q[1]] for q in quads_p])]
            gb = regs[jnp.asarray([slot[q[2]] for q in quads_p])]
            # [Gp, 3] tiles to gate-major rows on device (gate_rows)
            res = ctx.gate_rows(c3,
                                Ctxt(ga.reshape(Gp * B, width), lvl),
                                Ctxt(gb.reshape(Gp * B, width), lvl))
            outs = jnp.asarray([slot[q[0]] for q in quads_p],
                               dtype=jnp.int32)
            updates.append((outs, res.data.reshape(Gp, B, width)))
        for outs, vals in updates:
            regs = regs.at[outs].set(vals)

    return [Ctxt(regs[slot[w]], lvl) for w in sched.outputs]
