"""Encrypted multi-bit integers on programmable bootstrapping.

Beyond-parity layer (the reference is gate-only; its intended workloads —
kvsp processors, adders — are built from 10+ gate bootstraps per arithmetic
bit). Here an integer is a little-endian vector of radix-2^m *digits*, each
a lvl0 TLWE encrypting value v in [0, 2^m) at phase v*Delta:

    Delta = 2^32 / 2^(b+1),  b = buf_bits = msg_bits + 1

The extra buffer bit b > m holds carries ACCUMULATED LINEARLY (ciphertext
adds are free and exact on the torus), and the top "padding" bit keeps every
legal phase in [0, 2^31) so a negacyclic LUT is single-valued. A full adder
is then ONE blind rotation via the multi-output bootstrap (ops.bootstrap.
pbs_many): t = x_d + y_d + carry is a plain ciphertext sum, and the sum
digit (t mod 2^m) and carry digit (t >> m) come out of the same rotation as
two interleaved LUTs. Compare ~5 gate bootstraps per full-adder bit in the
reference's own netlist model (test/ circuits) — and 2 per bit for MUX-based
adders — vs 1/(msg_bits) rotations per bit here.

Noise budget (the decision margin of a LUT slot is Delta/2): an adder input
is at worst the sum of three fresh bootstrap outputs, std sqrt(3)*sigma_pbs,
plus the theta=1 mod-switch rounding. At the TFHEpp 128-bit set
(sigma_pbs ~ 2^24.85 measured, benchmarks/noise.py):

    msg_bits=1 (b=2): Delta/2 = 2^28 -> ~4.6 sigma  (production-viable)
    msg_bits=2 (b=3): Delta/2 = 2^27 -> ~2.3 sigma  (EXPERIMENTAL: percent-
                       level per-digit error; use for demos/short circuits)

benchmarks/integers.py measures both margins empirically; all ops here are
uint32-exact vs golden.pbs_many (noise is in the ciphertexts, not the
implementation).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import golden as G
from ..ops import bootstrap as B
from ..rng import resolve_rng
from .api import Context, Ctxt

U32 = jnp.uint32
_MOD = 1 << 32


@dataclasses.dataclass(frozen=True)
class IntCodec:
    """Digit encoding: msg_bits per digit, one carry-buffer bit, one
    padding bit. buf_bits defaults to msg_bits + 1 (exactly the headroom
    a ripple full adder needs: x + y + carry <= 2^(m+1) - 1)."""
    msg_bits: int = 1
    buf_bits: Optional[int] = None

    def __post_init__(self):
        if self.buf_bits is None:
            object.__setattr__(self, "buf_bits", self.msg_bits + 1)
        assert self.buf_bits >= self.msg_bits + 1

    @property
    def base(self) -> int:
        return 1 << self.msg_bits

    @property
    def delta(self) -> int:
        return 1 << (31 - self.buf_bits)

    def digits_for(self, bits: int) -> int:
        return -(-bits // self.msg_bits)


@dataclasses.dataclass
class IntCtxt:
    """A batch of encrypted unsigned integers: digits [B, D, n0+1] uint32,
    little-endian radix-2^msg_bits. Digits are always *clean* (fresh from
    encryption or a bootstrap, value < 2^msg_bits)."""
    digits: jnp.ndarray
    codec: IntCodec

    @property
    def batch(self) -> int:
        return self.digits.shape[0]

    @property
    def ndigits(self) -> int:
        return self.digits.shape[1]

    @property
    def bits(self) -> int:
        return self.ndigits * self.codec.msg_bits


# ---------------------------------------------------------------------------
# Test-polynomial (LUT) construction
# ---------------------------------------------------------------------------

def build_tv(outs: Sequence[np.ndarray], buf_bits: int, N: int) -> np.ndarray:
    """Interleave J LUTs into one test polynomial for pbs_many.

    outs: J arrays of 2^buf_bits uint32 torus outputs. Slot geometry:
    value v sits at phase v*Delta -> windows [v*dw - dw/2, v*dw + dw/2)
    with dw = N >> buf_bits coefficients per slot; tv[x] = outs[x % J][v(x)]
    so extraction at coefficient j (window w + j, w 2^theta-aligned) reads
    LUT j. The tail x >= N - dw/2 is the negacyclic wrap of v=0's negative
    noise lobe: extraction negates there, so it stores -outs[j][0]."""
    J = len(outs)
    dw = N >> buf_bits
    assert dw >= 2 * J, (dw, J, "LUT slots too narrow for interleaving")
    x = np.arange(N)
    v = (x + dw // 2) // dw                     # 0 .. 2^buf_bits
    nslots = 1 << buf_bits
    tv = np.zeros(N, dtype=np.uint32)
    for j in range(J):
        o = np.asarray(outs[j], dtype=np.uint32)
        assert o.shape == (nslots,)
        col = np.where(v < nslots, o[np.minimum(v, nslots - 1)],
                       (-o[0].astype(np.int64)) % _MOD).astype(np.uint32)
        sel = (x % J) == j
        tv[sel] = col[sel]
    return tv


def _enc_vals(vals: np.ndarray, codec: IntCodec) -> np.ndarray:
    return ((np.asarray(vals, dtype=np.uint64) * codec.delta) % _MOD).astype(
        np.uint32)


# ---------------------------------------------------------------------------
# Client side
# ---------------------------------------------------------------------------

def encrypt_uint(values: Sequence[int], bits: int, sk: G.SecretKey,
                 codec: IntCodec = IntCodec(),
                 rng: Optional[np.random.Generator] = None) -> IntCtxt:
    """Encrypt a batch of unsigned integers (client side)."""
    rng = resolve_rng(rng=rng)
    D = codec.digits_for(bits)
    m = codec.msg_bits
    digs = np.array([[(int(val) >> (m * d)) & (codec.base - 1)
                      for d in range(D)] for val in values],
                    dtype=np.uint32)                        # [B, D]
    mus = _enc_vals(digs, codec).reshape(-1)
    cts = G.tlwe_encrypt_batch(mus, sk.lvl0, sk.params.lvl0.alpha, rng)
    return IntCtxt(jnp.asarray(cts.reshape(len(values), D, -1)), codec)


def encrypt_int(values: Sequence[int], bits: int, sk: G.SecretKey,
                codec: IntCodec = IntCodec(),
                rng: Optional[np.random.Generator] = None) -> IntCtxt:
    """Encrypt SIGNED integers as two's complement mod 2^bits. (Python's
    arithmetic right shift makes encrypt_uint's digit extraction already
    produce the two's-complement digits for negative inputs; this alias
    documents the intent and range-checks.)"""
    for v in values:
        if not -(1 << (bits - 1)) <= int(v) < (1 << (bits - 1)):
            raise ValueError(f"{v} out of range for int{bits}")
    return encrypt_uint(values, bits, sk, codec, rng=rng)


def decrypt_int(x: IntCtxt, sk: G.SecretKey) -> list:
    """Decrypt as SIGNED two's-complement integers."""
    mod = 1 << x.bits
    return [v - mod if v >= mod // 2 else v for v in decrypt_uint(x, sk)]


def decrypt_uint(x: IntCtxt, sk: G.SecretKey) -> list:
    """Decrypt a batch of encrypted integers (client side)."""
    data = np.asarray(jax.device_get(x.digits))
    codec = x.codec
    m = codec.msg_bits
    out = []
    for row in data:
        val = 0
        for d, ct in enumerate(row):
            ph = int(G.tlwe_phase(ct, sk.lvl0))
            v = int(round(ph / codec.delta)) % (1 << (codec.buf_bits + 1))
            val += (v & (codec.base - 1)) << (m * d)
        out.append(val)
    return out


# ---------------------------------------------------------------------------
# Server side
# ---------------------------------------------------------------------------

class IntContext:
    """Server-side encrypted-integer evaluator over a gate Context.

    Every method is one (or a few) jitted programs cached per shape; the
    per-digit carry chain of add/sub runs as a lax.scan INSIDE one program
    (one dispatch per whole addition, like Context.gate_chain). Mesh
    sharding rides the wrapped Context's mesh (digit arrays are
    batch-leading)."""

    def __init__(self, ctx: Context, codec: IntCodec = IntCodec()):
        self.ctx = ctx
        self.codec = codec
        p = ctx.params
        N = p.lvl1.n
        m, b = codec.msg_bits, codec.buf_bits
        d = codec.delta
        vs = np.arange(1 << b)
        #: full-adder LUT pair: sum digit + carry from one rotation
        self._tv_add = jnp.asarray(build_tv(
            [_enc_vals(vs & (codec.base - 1), codec),
             _enc_vals(vs >> m, codec)], b, N))
        #: "differs" indicator: t = x + comp(y) == 2^m-1 iff x == y
        self._tv_ne = jnp.asarray(build_tv(
            [_enc_vals((vs != codec.base - 1).astype(np.uint32), codec)],
            b, N))
        #: OR of two {0,1} digits (t = u + v in {0,1,2})
        self._tv_or = jnp.asarray(build_tv(
            [_enc_vals((vs >= 1).astype(np.uint32), codec)], b, N))
        #: bivariate AND of two 1-bit digits (t = u + v == 2)
        self._tv_and2 = jnp.asarray(build_tv(
            [_enc_vals((vs >= 2).astype(np.uint32), codec)], b, N))

    # -- helpers ---------------------------------------------------------
    def _check(self, *xs: IntCtxt):
        for x in xs[1:]:
            if x.codec != xs[0].codec or x.digits.shape != xs[0].digits.shape:
                raise ValueError("operand codec/shape mismatch")
        if xs[0].codec != self.codec:
            raise ValueError("ciphertext codec differs from context codec")

    def trivial_uint(self, values: Sequence[int], bits: int) -> IntCtxt:
        """Noiseless server-side constants (trivial ciphertexts)."""
        codec = self.codec
        D = codec.digits_for(bits)
        m = codec.msg_bits
        n0 = self.ctx.params.lvl0.dim
        digs = np.array([[(int(v) >> (m * d)) & (codec.base - 1)
                          for d in range(D)] for v in values])
        data = np.zeros((len(values), D, n0 + 1), dtype=np.uint32)
        data[:, :, n0] = _enc_vals(digs, codec)
        return IntCtxt(jnp.asarray(data), codec)

    def _trivial_digit(self, B: int, value: int) -> jnp.ndarray:
        n0 = self.ctx.params.lvl0.dim
        row = np.zeros(n0 + 1, dtype=np.uint32)
        row[n0] = (value * self.codec.delta) % _MOD
        return jnp.broadcast_to(jnp.asarray(row), (B, n0 + 1))

    def _comp_digits(self, y: jnp.ndarray) -> jnp.ndarray:
        """Digitwise (2^m - 1) - v: ciphertext negation + constant — exact,
        noise-preserving (the two's-complement step of sub)."""
        n0 = self.ctx.params.lvl0.dim
        cmax = U32(((self.codec.base - 1) * self.codec.delta) % _MOD)
        out = jnp.negative(y)
        return out.at[..., n0].add(cmax)

    # -- add / sub -------------------------------------------------------
    def _add_prog(self):
        p, bk = self.ctx.params, self.ctx.backend
        n0 = p.lvl0.dim

        def run(xd, yd, cin, tv, keys):
            xt = jnp.moveaxis(xd, 1, 0)            # [D, B, n0+1]
            yt = jnp.moveaxis(yd, 1, 0)
            # trivial carry-in built ON DEVICE from the scalar: a host-built
            # c0 would ship [B, n0+1] through the tunnel on every dispatch
            c0 = jnp.zeros((xd.shape[0], n0 + 1), U32).at[:, n0].set(
                cin * U32(self.codec.delta))

            def body(c, ab):
                a, b_ = ab
                t = a + b_ + c                     # linear: digit sum fits b
                sc = B.pbs_many(t, tv, 2, keys, p, bk, theta=1)
                return sc[1], sc[0]                # carry out, sum digit

            cout, sums = jax.lax.scan(body, c0, (xt, yt))
            return jnp.moveaxis(sums, 0, 1), cout

        return run

    def add_full(self, x: IntCtxt, y: IntCtxt,
                 carry_in: int = 0) -> tuple:
        """Ripple add, ONE dispatch: returns (sum, carry_digit). The carry
        digit is a clean {0,1} digit ciphertext [B, n0+1] (the overflow
        bit; feed to digit_to_bool for the gate domain)."""
        self._check(x, y)
        prog = self.ctx._jit(("int_add", self.codec), self._add_prog(),
                             batch_argnums=(0, 1))
        sums, cout = prog(x.digits, y.digits, U32(carry_in), self._tv_add,
                          self.ctx.keys)
        return IntCtxt(sums, self.codec), cout

    def add(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        """x + y mod 2^bits (wrapping)."""
        return self.add_full(x, y)[0]

    def sub_full(self, x: IntCtxt, y: IntCtxt) -> tuple:
        """x - y via two's complement: (difference, ge_digit) where
        ge_digit is the final carry — a clean {0,1} digit encrypting
        x >= y."""
        self._check(x, y)
        prog = self.ctx._jit(("int_sub", self.codec), self._sub_prog(),
                             batch_argnums=(0, 1))
        sums, cout = prog(x.digits, y.digits, U32(1), self._tv_add,
                          self.ctx.keys)
        return IntCtxt(sums, self.codec), cout

    def _sub_prog(self):
        base = self._add_prog()

        def run(xd, yd, c0, tv, keys):
            return base(xd, self._comp_digits(yd), c0, tv, keys)

        return run

    def sub(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        return self.sub_full(x, y)[0]

    def add_scalar(self, x: IntCtxt, value: int) -> IntCtxt:
        return self.add(x, self.trivial_uint([value] * x.batch, x.bits))

    def sub_scalar(self, x: IntCtxt, value: int) -> IntCtxt:
        return self.sub(x, self.trivial_uint([value] * x.batch, x.bits))

    def neg(self, x: IntCtxt) -> IntCtxt:
        """Two's-complement negation mod 2^bits."""
        return self.sub(self.trivial_uint([0] * x.batch, x.bits), x)

    # -- comparisons -----------------------------------------------------
    def digit_to_bool(self, digit: jnp.ndarray) -> Ctxt:
        """{0,1} digit -> gate-domain bool (phase +-mu0): a pure linear
        rescale, p' = 2^(b-1) * p - mu0 (noise x 2^(b-1))."""
        p = self.ctx.params
        n0 = p.lvl0.dim
        out = digit * U32(1 << (self.codec.buf_bits - 1))
        out = out.at[..., n0].add(U32((-p.lvl0.mu) % _MOD))
        return Ctxt(out, 0)

    def bool_to_digit(self, ct: Ctxt) -> jnp.ndarray:
        """Gate-domain bool -> clean {0,1} digit (one bootstrap: sign LUT
        delta/2, then +delta/2)."""
        p, bk = self.ctx.params, self.ctx.backend
        half = self.codec.delta // 2
        tv = jnp.full((p.lvl1.n,), U32(half))

        def run(c, t, keys):
            out = B.programmable_bootstrap(c, t, keys, p, bk)
            return out.at[:, p.lvl0.dim].add(U32(half))

        prog = self.ctx._jit(("int_frombool", self.codec), run,
                             batch_argnums=(0,))
        return prog(ct.data, tv, self.ctx.keys)

    def ge(self, x: IntCtxt, y: IntCtxt) -> Ctxt:
        """x >= y as a gate-domain bool (cost: one sub)."""
        return self.digit_to_bool(self.sub_full(x, y)[1])

    def lt(self, x: IntCtxt, y: IntCtxt) -> Ctxt:
        out = self.ge(x, y)
        return Ctxt(jnp.negative(out.data), 0)

    def eq(self, x: IntCtxt, y: IntCtxt) -> Ctxt:
        """x == y as a gate-domain bool, ONE dispatch: per-digit "differs"
        indicators (one rotation each, all digits batched) + an OR tree of
        bivariate rotations + a linear NOT."""
        self._check(x, y)
        p, bk = self.ctx.params, self.ctx.backend
        n0 = p.lvl0.dim
        d = U32(self.codec.delta)

        def run(xd, yd, tv_ne, tv_or, keys):
            Bt, D = xd.shape[0], xd.shape[1]
            t = (xd + self._comp_digits(yd)).reshape(Bt * D, n0 + 1)
            ind = B.pbs_many(t, tv_ne, 1, keys, p, bk,
                             theta=0)[0].reshape(Bt, D, n0 + 1)
            cols = [ind[:, i] for i in range(D)]
            while len(cols) > 1:                   # OR tree
                nxt = []
                pairs = []
                for i in range(0, len(cols) - 1, 2):
                    pairs.append(cols[i] + cols[i + 1])
                if len(cols) % 2:
                    nxt.append(cols[-1])
                if pairs:
                    tt = jnp.concatenate(pairs, axis=0)
                    ors = B.pbs_many(tt, tv_or, 1, keys, p, bk, theta=0)[0]
                    nxt = list(ors.reshape(len(pairs), Bt, n0 + 1)) + nxt
                cols = nxt
            ne = cols[0]
            eq_digit = jnp.negative(ne).at[:, n0].add(d)   # 1 - v
            return eq_digit

        prog = self.ctx._jit(("int_eq", self.codec, x.ndigits), run,
                             batch_argnums=(0, 1))
        return self.digit_to_bool(prog(x.digits, y.digits, self._tv_ne,
                                       self._tv_or, self.ctx.keys))

    def eq_scalar(self, x: IntCtxt, value: int) -> Ctxt:
        return self.eq(x, self.trivial_uint([value] * x.batch, x.bits))

    # -- select / min / max ----------------------------------------------
    def select(self, cond: Ctxt, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        """cond ? x : y, digitwise (msg_bits=1): each output digit is
        (s AND x_d) + (NOT s AND y_d) — the two bivariate AND rotations of
        EVERY digit share one batched dispatch, and the results sum
        LINEARLY (exactly one term is nonzero, so the sum IS the selected
        value). Cost: 2 rotations/digit + 1/word (the cond bridge).
        Output digit noise is sqrt(2) x fresh (a linear add of two
        bootstrap outputs); the next adder input margin drops
        4.76 -> ~4.3 sigma, fine for chaining.

        `cond` is a gate-domain bool (Ctxt, phase +-mu) broadcast over all
        digits of each word."""
        self._check(x, y)
        if self.codec.msg_bits != 1:
            raise NotImplementedError("select is implemented for msg_bits=1")
        # A gate bool (phase +-mu0) cannot be rescaled DOWN to digit scale
        # linearly (mu0 = 2^29 is not invertible mod 2^32), so one
        # bootstrap bridges cond to a clean {0,1} digit — amortized over
        # every digit of the word. Then both AND rotations of every digit
        # share one batched dispatch and the results sum linearly.
        sdig = self.bool_to_digit(cond)                   # [B, n0+1]

        def run2(sd, xd, yd, tv_and, keys):
            return self._select_digits(sd, xd, yd, tv_and, keys)

        prog = self.ctx._jit(("int_select", self.codec), run2,
                             batch_argnums=(0, 1, 2))
        out = prog(sdig, x.digits, y.digits, self._tv_and2, self.ctx.keys)
        return IntCtxt(out, self.codec)

    # -- signed views (two's complement) -----------------------------------
    def _flip_msb(self, x: IntCtxt) -> IntCtxt:
        """Add 2^(bits-1) mod 2^bits: for msg_bits=1 the top digit's bit
        flip is the linear digit complement (negate + constant) — free and
        exact. Maps signed order onto unsigned order."""
        if self.codec.msg_bits != 1:
            raise NotImplementedError(
                "signed ops are implemented for msg_bits=1")
        top = self._comp_digits(x.digits[:, -1:])
        return IntCtxt(jnp.concatenate([x.digits[:, :-1], top], axis=1),
                       x.codec)

    def ge_signed(self, x: IntCtxt, y: IntCtxt) -> Ctxt:
        """Signed x >= y: flip both MSBs (linear, free) then compare
        unsigned — same cost as ge."""
        return self.ge(self._flip_msb(x), self._flip_msb(y))

    def lt_signed(self, x: IntCtxt, y: IntCtxt) -> Ctxt:
        out = self.ge_signed(x, y)
        return Ctxt(jnp.negative(out.data), 0)

    def min_signed(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        return self.select(self.ge_signed(x, y), y, x)

    def max_signed(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        return self.select(self.ge_signed(x, y), x, y)

    def abs_(self, x: IntCtxt) -> IntCtxt:
        """|x| for signed x (two's complement; |-2^(bits-1)| wraps to
        itself as in hardware): one comparison against zero + one neg +
        one select."""
        zero = self.trivial_uint([0] * x.batch, x.bits)
        return self.select(self.ge_signed(x, zero), x, self.neg(x))

    def min_(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        """Elementwise minimum: one sub (the comparison) + one select."""
        return self.select(self.ge(x, y), y, x)

    def max_(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        """Elementwise maximum: one sub + one select."""
        return self.select(self.ge(x, y), x, y)

    # -- LUTs and structure ----------------------------------------------
    def apply_lut(self, x: IntCtxt, table: Sequence[int]) -> IntCtxt:
        """Digitwise LUT: out_d = table[x_d] (one rotation per digit, all
        digits of the batch in one dispatch)."""
        self._check(x)
        codec = self.codec
        assert len(table) == codec.base
        p, bk = self.ctx.params, self.ctx.backend
        n0 = p.lvl0.dim
        vs = np.arange(1 << codec.buf_bits)
        outs = _enc_vals(np.asarray(table, dtype=np.uint64)[
            vs % codec.base], codec)
        tv = jnp.asarray(build_tv([outs], codec.buf_bits, p.lvl1.n))

        def run(xd, t, keys):
            Bt, D = xd.shape[0], xd.shape[1]
            flat = xd.reshape(Bt * D, n0 + 1)
            out = B.pbs_many(flat, t, 1, keys, p, bk, theta=0)[0]
            return out.reshape(Bt, D, n0 + 1)

        prog = self.ctx._jit(("int_lut", self.codec), run,
                             batch_argnums=(0,))
        return IntCtxt(prog(x.digits, tv, self.ctx.keys), codec)

    def shift_digits(self, x: IntCtxt, by: int) -> IntCtxt:
        """Shift by whole digits (left = towards high digits); vacated
        digits are trivial zeros. Free (no bootstraps)."""
        B_, D = x.batch, x.ndigits
        zero = self._trivial_digit(B_, 0)[:, None, :]
        if by >= 0:
            pads = jnp.broadcast_to(zero, (B_, min(by, D),
                                           zero.shape[-1]))
            kept = x.digits[:, :max(D - by, 0)]
        else:
            pads = jnp.broadcast_to(zero, (B_, min(-by, D),
                                           zero.shape[-1]))
            kept = x.digits[:, min(-by, D):]
            return IntCtxt(jnp.concatenate([kept, pads], axis=1), x.codec)
        return IntCtxt(jnp.concatenate([pads, kept], axis=1), x.codec)

    def _mul_prog(self, D: int):
        p, bk = self.ctx.params, self.ctx.backend
        n0 = p.lvl0.dim

        def run(xd, yd, tv_and, tv_add, keys):
            Bt = xd.shape[0]
            acc0 = jnp.zeros((Bt, 2 * D, n0 + 1), U32)  # trivial zeros

            def ripple(acc, add):
                # both [Bt, 2D, n0+1]; fused full-width carry chain
                c0 = jnp.zeros((Bt, n0 + 1), U32)

                def body(c, ab):
                    a, b_ = ab
                    sc = B.pbs_many(a + b_ + c, tv_add, 2, keys, p, bk,
                                    theta=1)
                    return sc[1], sc[0]

                _, sums = jax.lax.scan(
                    body, c0, (jnp.moveaxis(acc, 1, 0),
                               jnp.moveaxis(add, 1, 0)))
                return jnp.moveaxis(sums, 0, 1)

            def row_body(acc, inp):
                yr, r = inp
                t = (xd + yr[:, None, :]).reshape(Bt * D, n0 + 1)
                row = B.pbs_many(t, tv_and, 1, keys, p, bk,
                                 theta=0)[0].reshape(Bt, D, n0 + 1)
                shifted = jax.lax.dynamic_update_slice(
                    jnp.zeros((Bt, 2 * D, n0 + 1), U32), row, (0, r, 0))
                return ripple(acc, shifted), None

            acc, _ = jax.lax.scan(row_body, acc0,
                                  (jnp.moveaxis(yd, 1, 0),
                                   jnp.arange(D)))
            return acc

        return run

    def _select_digits(self, g, a, b_, tv_and, keys):
        """Digitwise g ? a : b_ where g is a CLEAN {0,1} digit [B, n0+1]
        (no gate-bool bridge needed) and a/b_ are [B, W, n0+1]. Both
        bivariate-AND rotation sets share one pbs_many call; the results
        sum linearly (exactly one term per digit is nonzero)."""
        p, bk = self.ctx.params, self.ctx.backend
        n0 = p.lvl0.dim
        Bt, W = a.shape[0], a.shape[1]
        ns = jnp.negative(g).at[:, n0].add(U32(self.codec.delta))
        t1 = (a + g[:, None, :]).reshape(Bt * W, n0 + 1)
        t0 = (b_ + ns[:, None, :]).reshape(Bt * W, n0 + 1)
        both = jnp.concatenate([t1, t0], axis=0)
        r = B.pbs_many(both, tv_and, 1, keys, p, bk, theta=0)[0]
        return (r[:Bt * W] + r[Bt * W:]).reshape(Bt, W, n0 + 1)

    def _div_prog(self, D: int):
        p, bk = self.ctx.params, self.ctx.backend
        n0 = p.lvl0.dim
        W = D + 1                                  # remainder register width

        def run(xd, yd, tv_add, tv_and, keys):
            Bt = xd.shape[0]
            zero = jnp.zeros((Bt, n0 + 1), U32)
            # divisor zero-extended to W digits; complemented once for the
            # two's-complement trial subtraction of every step
            cyW = self._comp_digits(
                jnp.concatenate([yd, zero[:, None, :]], axis=1))

            def sub_trial(r2):
                # r2 - y = r2 + comp(y) + 1 rippled over W digits; the
                # final carry is the (r2 >= y) indicator.
                c0 = zero.at[:, n0].add(U32(self.codec.delta))

                def body(c, ab):
                    a, b_ = ab
                    sc = B.pbs_many(a + b_ + c, tv_add, 2, keys, p, bk,
                                    theta=1)
                    return sc[1], sc[0]

                ge, diffs = jax.lax.scan(
                    body, c0, (jnp.moveaxis(r2, 1, 0),
                               jnp.moveaxis(cyW, 1, 0)))
                return jnp.moveaxis(diffs, 0, 1), ge

            def step(r, xbit):
                # r2 = 2r + next dividend bit. The dropped top digit is
                # always an encryption of 0 (the loop invariant keeps
                # r < 2^D before the shift).
                r2 = jnp.concatenate([xbit[:, None, :], r[:, :-1]], axis=1)
                diff, ge = sub_trial(r2)
                return self._select_digits(ge, diff, r2, tv_and, keys), ge

            r0 = jnp.zeros((Bt, W, n0 + 1), U32)
            xs_hi_first = jnp.moveaxis(xd, 1, 0)[::-1]
            r, qbits = jax.lax.scan(step, r0, xs_hi_first)
            q = jnp.moveaxis(qbits[::-1], 0, 1)    # back to little-endian
            return q, r[:, :D]

        return run

    def divmod_(self, x: IntCtxt, y: IntCtxt) -> tuple:
        """Restoring division, ONE dispatch: returns (x // y, x % y).
        msg_bits=1 only. Per quotient bit: one (D+1)-digit trial
        subtraction + one digitwise select, all inside a lax.scan —
        ~3*D^2 rotations per divide, one dispatch total. Division by an
        encrypted zero follows the restoring-hardware convention:
        quotient = 2^bits - 1, remainder = x."""
        self._check(x, y)
        if self.codec.msg_bits != 1:
            raise NotImplementedError("divmod_ is implemented for msg_bits=1")
        D = x.ndigits
        prog = self.ctx._jit(("int_div", self.codec, D), self._div_prog(D),
                             batch_argnums=(0, 1))
        q, r = prog(x.digits, y.digits, self._tv_add, self._tv_and2,
                    self.ctx.keys)
        return IntCtxt(q, self.codec), IntCtxt(r, self.codec)

    def div(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        return self.divmod_(x, y)[0]

    def mod(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        return self.divmod_(x, y)[1]

    def _shift_prog(self, D: int, S: int, sign: int):
        p, bk = self.ctx.params, self.ctx.backend
        n0 = p.lvl0.dim

        def run(xd, ad, tv_and, keys):
            Bt = xd.shape[0]
            cur = xd
            for i in range(S):                     # unrolled: S is static
                k = sign * (1 << i)
                if abs(k) >= D:
                    shifted = jnp.zeros_like(cur)  # trivial zeros
                elif k > 0:
                    pad = jnp.zeros((Bt, k, n0 + 1), U32)
                    shifted = jnp.concatenate([pad, cur[:, :D - k]], axis=1)
                else:
                    pad = jnp.zeros((Bt, -k, n0 + 1), U32)
                    shifted = jnp.concatenate([cur[:, -k:], pad], axis=1)
                cur = self._select_digits(ad[:, i], shifted, cur, tv_and,
                                          keys)
            return cur

        return run

    def _shift_by(self, x: IntCtxt, amount: IntCtxt, sign: int,
                  tag: str) -> IntCtxt:
        if x.codec != self.codec or amount.codec != self.codec:
            raise ValueError("ciphertext codec differs from context codec")
        if self.codec.msg_bits != 1:
            raise NotImplementedError("shifts are implemented for msg_bits=1")
        if amount.batch != x.batch:
            raise ValueError("shift amount batch differs from operand batch")
        D, S = x.ndigits, amount.ndigits
        prog = self.ctx._jit((tag, self.codec, D, S),
                             self._shift_prog(D, S, sign),
                             batch_argnums=(0, 1))
        out = prog(x.digits, amount.digits, self._tv_and2, self.ctx.keys)
        return IntCtxt(out, self.codec)

    def shift_left(self, x: IntCtxt, amount: IntCtxt) -> IntCtxt:
        """x << amount with an ENCRYPTED shift amount: a barrel shifter of
        amount.ndigits stages (stage i selects between x and the static
        2^i-digit shift under bit i of the amount), ONE dispatch,
        2*D rotations per stage. Amounts >= bits yield 0 (bits shifted
        past the top are dropped, vacated digits are trivial zeros)."""
        return self._shift_by(x, amount, +1, "int_shl")

    def shift_right(self, x: IntCtxt, amount: IntCtxt) -> IntCtxt:
        """Logical x >> amount with an ENCRYPTED amount (see shift_left)."""
        return self._shift_by(x, amount, -1, "int_shr")

    def mul(self, x: IntCtxt, y: IntCtxt) -> IntCtxt:
        """Schoolbook product (full 2*bits width), ONE dispatch. msg_bits=1
        only: the whole product — partial-product rows as bivariate AND
        rotations, accumulated with fused ripple adds — runs as a lax.scan
        over rows inside one compiled program: ~3*D^2 rotations per product
        (vs ~6*D^2 gate bootstraps for the netlist multiplier) and one
        dispatch instead of 2*D."""
        self._check(x, y)
        if self.codec.msg_bits != 1:
            raise NotImplementedError("mul is implemented for msg_bits=1")
        D = x.ndigits
        prog = self.ctx._jit(("int_mul", self.codec, D), self._mul_prog(D),
                             batch_argnums=(0, 1))
        acc = prog(x.digits, y.digits, self._tv_and2, self._tv_add,
                   self.ctx.keys)
        return IntCtxt(acc, self.codec)
