"""Fused Pallas blind-rotate kernel vs golden model (interpret mode on CPU
— this proves the kernel MATH uint32-exactly; Mosaic lowering on real
hardware is separately proven by benchmarks/golden_check.py, the suite's
`golden` section, and tests/test_onchip.py under CUFHE_RUN_TPU=1)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cufhe_tpu import golden as G
from cufhe_tpu import params as P
from cufhe_tpu.ops import bootstrap as B
from cufhe_tpu.ops import keys as K


@pytest.fixture(scope="module")
def pallas_key():
    sk = G.keygen(P.PALLAS_TINY, seed=10)
    ek = G.make_eval_key(sk, seed=11)
    return sk, ek


def test_backend_resolution():
    assert B.resolve_backend("auto", P.TFHEPP_128) == "pallas"
    assert B.resolve_backend("auto", P.TINY) == "conv"        # N=64
    assert B.resolve_backend("auto", P.TFHEPP_80) == "pallas"  # digit limbs
    assert B.resolve_backend("conv", P.TFHEPP_128) == "conv"


def test_pallas_blind_rotate_bitexact(pallas_key, rng):
    sk, ek = pallas_key
    p = sk.params
    keys = K.prepare_keys(ek)
    cts = [G.encrypt_bit(b, sk, rng) for b in (0, 1, 1, 0)]
    want = np.stack([G.blind_rotate(c, p.lvl1.mu, ek) for c in cts])
    batch = jnp.asarray(np.stack(cts))
    got = np.asarray(B.blind_rotate(batch[:, :p.n0], batch[:, p.n0],
                                    p.lvl1.mu, keys, p, "pallas"))
    assert np.array_equal(got, want)


def test_pallas_full_gate_bitexact(pallas_key, rng):
    sk, ek = pallas_key
    p = sk.params
    keys = K.prepare_keys(ek)
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    want = np.stack([G.gate_lvl0("nand", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)
    assert [G.decrypt_bit(g, sk) for g in got] == \
        [1 - (a & b) for a, b in zip(bits0, bits1)]


def test_wext_prep_roundtrip(pallas_key):
    """wext column 4p+c is the c-rotated negacyclic extension of the limb
    polynomial, and limbs recombine to the original BK mod 2^32."""
    from cufhe_tpu.ops.pallas_br import (BK_COPIES, BK_LIMB_BITS, BK_NLIMBS,
                                         prepare_wext)
    _, ek = pallas_key
    p = ek.params
    w = prepare_wext(ek.bk, p)
    N = p.lvl1.n
    I = (p.lvl1.k + 1) * p.lvl1.l
    # recombine limbs for poly (i=0, j=0, o=0)
    rec = np.zeros(N, dtype=np.int64)
    for li in range(BK_NLIMBS):
        col = (0 * BK_NLIMBS + li) * I + 0
        poly = w[0, N:2 * N, BK_COPIES * col].astype(np.int64)
        rec += poly << (BK_LIMB_BITS * li)
        # pre-rotated copies match np.roll
        for c in (1, 3, BK_COPIES - 1):
            assert np.array_equal(w[0, :, BK_COPIES * col + c],
                                  np.roll(w[0, :, BK_COPIES * col], c))
    assert np.array_equal(rec.astype(np.uint32), ek.bk[0, 0, 0])


def test_pallas3_reduced_precision_gate(pallas_key, rng):
    """'pallas3' fast path (top-24-bit BK, the small-modulus analogue):
    not bit-exact, but must decrypt correctly — the added noise is far
    inside the decryption margin."""
    from cufhe_tpu.ops import keys as K2
    sk, ek = pallas_key
    p = sk.params
    keys3 = K2.prepare_keys(ek, backends=("pallas3",))
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys3, p,
                                 backend="pallas3"))
    assert [G.decrypt_bit(g, sk) for g in got] == \
        [1 - (a & b) for a, b in zip(bits0, bits1)]


def test_pallas_bg10_digit_limb_gate(rng):
    """Bg=1024 (USE_80BIT_SECURITY gadget shape) through the pallas kernel
    with the two-sub-digit split: bit-exact vs golden."""
    sk = G.keygen(P.PALLAS_BG10, seed=30)
    ek = G.make_eval_key(sk, seed=31)
    p = sk.params
    assert B.resolve_backend("auto", p) == "pallas"
    rng2 = np.random.default_rng(32)
    keys = K.prepare_keys(ek, backends=("pallas",))
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng2) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng2) for b in bits1]
    want = np.stack([G.gate_lvl0("xor", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["xor"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)
    assert [G.decrypt_bit(g, sk) for g in got] == \
        [a ^ b for a, b in zip(bits0, bits1)]


def test_pallas_k2_concrete_style_gate(rng):
    """k=2 (CONCRETE-style) parameters through the fused kernel: 3 TRLWE
    components, Bgbit=8 digits — the generalized loops must stay bit-exact."""
    sk = G.keygen(P.PALLAS_TINY_K2, seed=20)
    ek = G.make_eval_key(sk, seed=21)
    p = sk.params
    keys = K.prepare_keys(ek, backends=("pallas",))
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    want = np.stack([G.gate_lvl0("or", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["or"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)
    assert [G.decrypt_bit(g, sk) for g in got] == \
        [a | b for a, b in zip(bits0, bits1)]


def test_pallas_stagger_bitexact(rng):
    """Staggered half-tile pipeline (batch tile >= 256 at depth 2): the
    software-pipelined schedule — half B lagging half A by ~half an
    iteration, boundary rotate/decompose in the other half's MXU shadow —
    must stay bit-exact, including the masked pipeline warm-up/drain
    iterations. PALLAS_KAR at B=256 is the smallest stagger-eligible
    config (S=9 dot steps, bt=256 -> 128-lane halves)."""
    from cufhe_tpu.ops.pallas_br import _make_kernel
    sk = G.keygen(P.PALLAS_KAR, seed=40)
    ek = G.make_eval_key(sk, seed=41)
    p = sk.params
    assert _make_kernel(p, 4, 2, b_tile=256)[1]["stagger"]
    keys = K.prepare_keys(ek, backends=("pallas",))
    Bn = 256
    bits0 = rng.integers(2, size=Bn)
    bits1 = rng.integers(2, size=Bn)
    c0 = G.encrypt_bit_batch(bits0, sk, rng)
    c1 = G.encrypt_bit_batch(bits1, sk, rng)
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"], jnp.asarray(c0),
                                 jnp.asarray(c1), keys, p, backend="pallas"))
    idx = list(range(0, Bn, 41)) + [127, 128, 255]   # spot rows, both halves
    want = np.stack([G.gate_lvl0("nand", c0[i], c1[i], ek) for i in idx])
    assert np.array_equal(got[idx], want)
    dec = np.array([G.decrypt_bit(g, sk) for g in got])
    assert int(np.sum(dec != (1 - (bits0 & bits1)))) == 0


def test_stagger_schedule_safety(monkeypatch):
    """The staggered pipeline's band-buffer layout (count + odd-body slot
    offset) must be proven safe by schedule simulation, not assumed: S=8
    (the TFHEPP_80 dot-step count) under the old S-derived offset with
    NBUF=4 lets a later build overwrite a slot before the lagging half-B
    dots of the same iteration read it — corrupting lanes [bt/2:]. The
    searched offset (NBUF=6, O=2) is safe and keeps TFHEPP_80 on the
    staggered schedule. (Expectations are for the default lag layout —
    pinned, since CUFHE_SEQ=block picks different buffer counts.)"""
    monkeypatch.setenv("CUFHE_SEQ", "lag")
    from cufhe_tpu.ops.pallas_br import (BK_NLIMBS, _make_kernel,
                                         _pick_stagger_buffers,
                                         _stagger_schedule_ok, _stagger_seq,
                                         kar_depth)
    # Shipped staggered layouts are safe (S, NBUF, odd-body offset).
    for S, nbuf, off in [(9, 6, 3), (6, 6, 0), (4, 4, 0), (8, 6, 2)]:
        seq, _ = _stagger_seq(S)
        assert seq is not None
        assert _stagger_schedule_ok(S, nbuf, seq, off)
        assert _pick_stagger_buffers(S, seq) == (nbuf, off)
    # The S=8 corruption case: both divisor-eligible candidates of the old
    # ((2S) % NBUF == 0)-only rule are provably unsafe — NBUF=4 (the one
    # the old code picked and shipped) and NBUF=2.
    seq8, _ = _stagger_seq(8)
    assert not any(_stagger_schedule_ok(8, d, seq8, 8 % d) for d in (4, 2))
    # Production TFHEPP_80 kernel: staggered via the proven layout. Its
    # digit-limb split now composes with depth-2 Karatsuba (kar_depth = 2,
    # S = 9 like the 128-bit set); the S = 8 shape remains reachable by
    # forcing depth 0 and must keep the searched safe layout.
    p = P.TFHEPP_80
    assert kar_depth(p.lvl1) == 2
    _, meta = _make_kernel(p, BK_NLIMBS, kar_depth(p.lvl1), b_tile=256)
    assert meta["stagger"] is True and meta["S"] == 9
    assert (meta["NBUF"], meta["O"]) == (6, 3)
    _, meta0 = _make_kernel(p, BK_NLIMBS, 0, b_tile=256)
    assert meta0["stagger"] is True and meta0["S"] == 8
    assert (meta0["NBUF"], meta0["O"]) == (6, 2)
    # Large S (e.g. 12) get a proven layout from the extended search
    # rather than a fallback guess.
    seq12, _ = _stagger_seq(12)
    pick12 = _pick_stagger_buffers(12, seq12)
    assert pick12 is not None
    assert _stagger_schedule_ok(12, pick12[0], seq12, pick12[1])


def test_pallas_forced_s8_bitexact(pallas_key, rng, monkeypatch):
    """Regression for the S=8 corruption: force NG=8 dot steps per
    iteration (CUFHE_GOL=1) on the tiny set at a stagger-eligible batch
    (256 -> two 128-lane halves). Under the old S-derived slot offset this
    shape staggered with NBUF=4 and produced wrong values in rows [128:];
    the searched (NBUF=6, O=2) layout must stay bit-exact in both halves."""
    monkeypatch.setenv("CUFHE_GOL", "1")
    from cufhe_tpu.ops.pallas_br import BK_NLIMBS, _make_kernel
    sk, ek = pallas_key
    p = sk.params
    _, meta = _make_kernel(p, BK_NLIMBS, 0, b_tile=256)
    assert meta["GOL"] == 1 and meta["stagger"] is True
    import os
    if os.environ.get("CUFHE_SEQ", "lag") == "lag":
        assert (meta["NBUF"], meta["O"]) == (6, 2)
    keys = K.prepare_keys(ek, backends=("pallas",))
    Bn = 256
    bits0 = rng.integers(2, size=Bn)
    bits1 = rng.integers(2, size=Bn)
    c0 = G.encrypt_bit_batch(bits0, sk, rng)
    c1 = G.encrypt_bit_batch(bits1, sk, rng)
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"], jnp.asarray(c0),
                                 jnp.asarray(c1), keys, p, backend="pallas"))
    idx = [0, 1, 64, 127, 128, 129, 200, 255]       # spot rows, both halves
    want = np.stack([G.gate_lvl0("nand", c0[i], c1[i], ek) for i in idx])
    assert np.array_equal(got[idx], want)


@pytest.mark.parametrize("layout", ["lag", "block"])
def test_stagger_seq_structure(layout, monkeypatch):
    """Structural invariants of every generated dot-issue sequence, both
    layouts, S=2..16: each step dotted exactly once per half; every
    previous-iteration (Bp) dot precedes the half-B fold tick and every
    current-iteration B dot follows it (the fold rewrites half B's dec
    plane, so violations are silent data corruption); every band build
    lands before the dot that reads it."""
    monkeypatch.setenv("CUFHE_SEQ", layout)
    from cufhe_tpu.ops.pallas_br import _stagger_builds_at, _stagger_seq
    for S in range(2, 17):
        seq, r = _stagger_seq(S)
        if seq is None:
            continue
        assert sorted(s for hh, s in seq if hh == "A") == list(range(S))
        assert sorted(s for hh, s in seq if hh in ("B", "Bp")) == \
            list(range(S))
        h1 = min(t for t, (hh, _) in enumerate(seq) if hh == "B") - 1
        assert all(t <= h1 for t, (hh, _) in enumerate(seq) if hh == "Bp")
        assert all(t > h1 for t, (hh, _) in enumerate(seq) if hh == "B")
        # A dots all issue by the end (h0 fold is the last tick, so no
        # A-after-h0 case exists); builds precede their A dots
        posA = {s: t for t, (hh, s) in enumerate(seq) if hh == "A"}
        for t, bs in _stagger_builds_at(seq, S).items():
            for off, s in bs:
                if off == 0:
                    assert t < posA[s], (S, s)


def test_pallas_forced_s3_lag1_bitexact(rng, monkeypatch):
    """S=3 (CONCRETE's dot-step count) staggers with lag r=1 — a thinner
    pipeline whose structural constraints (every Bp dot before the half-B
    fold, every B dot after) are tightest at this size. Force S=3 on the
    tiny k=2 set (CUFHE_GOL=4: OL=12 -> NG=3) at a stagger-eligible batch
    and check bit-exactness in both halves."""
    monkeypatch.setenv("CUFHE_GOL", "4")
    from cufhe_tpu.ops.pallas_br import BK_NLIMBS, _make_kernel
    sk = G.keygen(P.PALLAS_TINY_K2, seed=50)
    ek = G.make_eval_key(sk, seed=51)
    p = sk.params
    _, meta = _make_kernel(p, BK_NLIMBS, 0, b_tile=256)
    assert meta["GOL"] == 4 and meta["stagger"] is True
    keys = K.prepare_keys(ek, backends=("pallas",))
    Bn = 256
    bits0 = rng.integers(2, size=Bn)
    bits1 = rng.integers(2, size=Bn)
    c0 = G.encrypt_bit_batch(bits0, sk, rng)
    c1 = G.encrypt_bit_batch(bits1, sk, rng)
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["xor"], jnp.asarray(c0),
                                 jnp.asarray(c1), keys, p, backend="pallas"))
    idx = [0, 1, 100, 127, 128, 129, 200, 255]      # spot rows, both halves
    want = np.stack([G.gate_lvl0("xor", c0[i], c1[i], ek) for i in idx])
    assert np.array_equal(got[idx], want)


@pytest.mark.parametrize("depth", [0, 1, 2])
def test_pallas_karatsuba_bitexact(depth, rng, monkeypatch):
    """Block-Karatsuba external product must be bit-identical to the golden
    model at every depth (it is an exact mod-2^32 rearrangement)."""
    monkeypatch.setenv("CUFHE_KAR_DEPTH", str(depth))
    from cufhe_tpu.ops.pallas_br import kar_depth
    sk = G.keygen(P.PALLAS_KAR, seed=30 + depth)
    ek = G.make_eval_key(sk, seed=31 + depth)
    p = sk.params
    assert kar_depth(p.lvl1) == depth
    keys = K.prepare_keys(ek, backends=("pallas",))
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    want = np.stack([G.gate_lvl0("nand", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)
    assert [G.decrypt_bit(g, sk) for g in got] == \
        [1 - (a & b) for a, b in zip(bits0, bits1)]


@pytest.mark.parametrize("depth", [1, 2])
def test_pallas_bg10_karatsuba_bitexact(depth, rng, monkeypatch):
    """Digit-limb split COMPOSED with block-Karatsuba (the 80-bit Bg=1024
    fast path): both are exact linear rearrangements mod 2^32 — sub-digit
    leaf sums stay int8 (|d| < 2^(dbits-1) = 32, x 2^depth <= 128) and the
    pre-scaled generators combine into Karatsuba leaf generators the same
    way unscaled ones do — so results must stay bit-identical to golden."""
    monkeypatch.setenv("CUFHE_KAR_DEPTH", str(depth))
    from cufhe_tpu.ops.limbs import decomp_digit_limb_plan
    from cufhe_tpu.ops.pallas_br import kar_depth
    sk = G.keygen(P.PALLAS_BG10_KAR, seed=60 + depth)
    ek = G.make_eval_key(sk, seed=61 + depth)
    p = sk.params
    assert decomp_digit_limb_plan(p.lvl1.Bgbit) == (2, 6)
    assert kar_depth(p.lvl1) == depth
    keys = K.prepare_keys(ek, backends=("pallas",))
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    want = np.stack([G.gate_lvl0("xor", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["xor"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)
    assert [G.decrypt_bit(g, sk) for g in got] == \
        [a ^ b for a, b in zip(bits0, bits1)]


@pytest.mark.parametrize("count", [3, 9])
def test_pallas_preband_bitexact(rng, count):
    """Precomputed band planes (CUFHE_PREBAND): the first `count` dot steps
    DMA their stacked band-window operator from HBM instead of shearing it
    in VMEM — an exact data-path swap, so results stay bit-identical to
    the golden model for both a partial (3 of 9) and a full (9 = no
    in-kernel builds at all) precompute."""
    import dataclasses

    from cufhe_tpu.ops import pallas_br as PBR
    sk = G.keygen(P.PALLAS_KAR, seed=50)
    ek = G.make_eval_key(sk, seed=51)
    p = sk.params
    keys = K.prepare_keys(ek, backends=("pallas",))
    pre = PBR.prepare_prebands(keys.bk_wext, p, nlimbs=4, depth=2,
                               count=count)
    assert len(pre) == count
    # prebands force the plain schedule (the stagger band slots are the
    # work they remove)
    dims = PBR._make_kernel(p, 4, 2, b_tile=256, preband=count)[1]
    assert dims["PB"] == count and not dims["stagger"]
    keys2 = dataclasses.replace(keys, bk_prebands=pre)
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    want = np.stack([G.gate_lvl0("nand", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys2, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)


def test_pallas_preband_env_path(pallas_key, rng, monkeypatch):
    """CUFHE_PREBAND=N wires prepare_keys -> DeviceKeys.bk_prebands ->
    the kernel (clamped to the dot-step count; depth-0 PALLAS_TINY has a
    single dot step)."""
    monkeypatch.setenv("CUFHE_PREBAND", "4")
    sk, ek = pallas_key
    p = sk.params
    keys = K.prepare_keys(ek, backends=("pallas",))
    assert len(keys.bk_prebands) == 1        # S = 1 at depth 0 clamps it
    bits0, bits1 = [1, 0], [1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    want = np.stack([G.gate_lvl0("nand", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)


def _preband_odd_n0_check():
    """The preband unroll-by-2 loop's overshoot body (odd lvl0 dimension:
    masked digits, skipped DMA waits) must contribute exact zeros — no
    shipped preset has odd n0, so this exercises the path on a crafted
    7-coefficient set."""
    import dataclasses

    from cufhe_tpu.ops import pallas_br as PBR
    rng = np.random.default_rng(62)
    p = dataclasses.replace(
        P.PALLAS_KAR, name="pallas-kar-odd-n0-test",
        lvl0=dataclasses.replace(P.PALLAS_KAR.lvl0, n=7))
    sk = G.keygen(p, seed=60)
    ek = G.make_eval_key(sk, seed=61)
    keys = K.prepare_keys(ek, backends=("pallas",))
    pre = PBR.prepare_prebands(keys.bk_wext, p, nlimbs=4, depth=2, count=4)
    keys2 = dataclasses.replace(keys, bk_prebands=pre)
    bits0, bits1 = [0, 1, 0, 1], [0, 0, 1, 1]
    c0 = [G.encrypt_bit(b, sk, rng) for b in bits0]
    c1 = [G.encrypt_bit(b, sk, rng) for b in bits1]
    want = np.stack([G.gate_lvl0("nand", a, b, ek) for a, b in zip(c0, c1)])
    got = np.asarray(B.gate_lvl0(G.GATE_CONSTANTS["nand"],
                                 jnp.asarray(np.stack(c0)),
                                 jnp.asarray(np.stack(c1)), keys2, p,
                                 backend="pallas"))
    assert np.array_equal(got, want)


def test_pallas_preband_odd_n0_bitexact():
    """Runs _preband_odd_n0_check in a FRESH interpreter: this program
    (depth-2 Karatsuba + preband DMA + odd-n0 masked tail) is the largest
    compile in the suite, and XLA's CPU compiler segfaults on it when run
    after the whole suite's accumulated compile state (it passes in
    isolation and after any single other module). Process isolation keeps
    the coverage without the order-dependent crash."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import sys; sys.path[:0] = [%r, %r]; "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import test_pallas; test_pallas._preband_odd_n0_check()"
            % (root, os.path.join(root, "tests")))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"


def test_pallas_programmable_bootstrap_bitexact(pallas_key, rng):
    """PBS through the production Pallas kernel (the custom rotated test
    vector enters as the kernel's acc_init) vs the golden model."""
    sk, ek = pallas_key
    p = sk.params
    keys = K.prepare_keys(ek)
    cts = [G.encrypt_bit(b, sk, rng) for b in (0, 1, 1, 0)]
    batch = jnp.asarray(np.stack(cts))
    tv = rng.integers(0, 1 << 32, p.lvl1.n,
                      dtype=np.uint64).astype(np.uint32)
    want = np.stack([G.blind_rotate_tv(c, tv, ek) for c in cts])
    got = np.asarray(B.pbs_tlwe2trlwe(batch, jnp.asarray(tv), keys, p,
                                      "pallas"))
    assert np.array_equal(got, want)
