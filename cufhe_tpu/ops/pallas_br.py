"""Fused Pallas blind-rotation kernel — the speed-of-light core.

One pallas_call runs the *entire* n0-iteration CMUX accumulator loop
(the reference's per-gate fused kernel, __BlindRotate__ + Accumulate,
gatebootstrapping_gpu.cuh:287-314/115-285) for a batch tile:

  * the TRLWE accumulator stays in VMEM for all n0 iterations,
  * the limb-decomposed bootstrapping key streams HBM→VMEM with a
    double-buffered async DMA per iteration,
  * the negacyclic monomial rotation is a barrel shifter (nbit conditional
    static sublane rolls + one sign select — no gathers),
  * the external product runs on the MXU as deep int8 dots against
    Toeplitz bands Mt[u, r] = w[(u - r) mod W] generated in VMEM by a
    log-depth shear (conditional rolls on a packed int32 view), with the
    decomposed digits laid out in matching (window, poly, offset) row order,
  * optionally, the N x N block-Toeplitz operator is evaluated with a
    block-Karatsuba recursion (the [A B; C A] three-multiplication
    identity): at depth d, 3^d leaf products of size N/2^d replace the
    (2^d)^2 block-products of the direct method — 9/16 of the MXU MACs at
    depth 2. The leaf *generators* are host-precomputed u32 combinations of
    the key (then limb-decomposed, so digits stay int8 and every partial
    sum stays exact mod 2^32); the leaf *operands* are int8 sums of digit
    segments whose magnitude is bounded by gating the depth on Bgbit.
    The rearrangement is exact integer arithmetic: results stay
    bit-identical to the golden model.

Layout: everything in the kernel is 2-D with the *batch on lanes* and the
polynomial coefficient axis on sublanes — the layout Mosaic vectorizes
cleanly, and it puts N (not the batch tile) on the MXU row dimension.

This replaces the reference NTT entirely: the MXU makes exact direct
negacyclic convolution (bit-identical to the large-modulus NTT path) faster
than a translated prime-field butterfly network would be.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import GateParams, TrlweParams
from .limbs import decomp_digit_limb_plan

U32 = jnp.uint32

#: BK limb format for this kernel: balanced base-2^8 digits; 4 limbs is the
#: minimum int8 encoding of a full 32-bit torus value (bit-exact mode). The
#: negacyclic extension *negates* coefficients, and -(-128) does not fit
#: int8, so prepare_wext negates in uint32 (mod 2^32) *before* limb
#: decomposition rather than negating digits.
#:
#: 3 limbs ("pallas3" backend) keeps only the top 24 BK bits — the analogue
#: of the reference's USE_SMALL_NTT_MODULUS 29-bit discretization
#: (ntt_small_modulus.cuh:40-73): ~25% less MXU work, key HBM and band
#: traffic, at the cost of extra noise of std ~2^21 on the 2^32 torus at the
#: l=3 128-bit set. Not bit-exact vs the golden model, and NOT recommended
#: on reduced-l parameter sets (tradeoffs do not compose; see DESIGN.md).
BK_NLIMBS = 4
BK_LIMB_BITS = 8

#: Pre-rotated copies of each extended key polynomial stored in HBM. The
#: in-kernel shear that turns a key column into a Toeplitz band needs one
#: conditional roll per column-index bit not covered by a pre-rotated copy;
#: 16 copies leave only 3 rolls (bits 4..6 of the 128 band columns) at the
#: cost of 16x key HBM (~1 GiB at the 128-bit set) and negligible DMA.
#: (Measured: 32 copies is not faster and doubles key HBM/prep time.)
BK_COPIES = 16


def band_grouping(lp: TrlweParams, nlimbs: int = BK_NLIMBS,
                  depth: int = 0):
    """Static kernel dimensions shared between the kernel builder and the
    band-plane precompute: (nd, I, L, leaf_n, OL, GOL, NG).

    GOL = how many (component, limb) operators stack into one MXU dot,
    capped so one band-window buffer stays ~<=8 MB (leaves the 128-bit
    depth-2 config at full stacking while keeping depth-1 N=1024 sets
    like CGGI19 inside the VMEM budget). Overridable with CUFHE_GOL
    (perf A/B only)."""
    nd, _ = decomp_digit_limb_plan(lp.Bgbit)
    I = (lp.k + 1) * lp.l * nd
    L = 3 ** depth
    leaf_n = lp.n >> depth
    OL = (lp.k + 1) * nlimbs
    per_ol = leaf_n * I * leaf_n
    GOL = 1
    for g in range(1, OL + 1):
        if OL % g == 0 and g * per_ol <= (8 << 20):
            GOL = g
    env_gol = os.environ.get("CUFHE_GOL", "")   # perf A/B only
    if env_gol and OL % int(env_gol) == 0:
        GOL = int(env_gol)
    return nd, I, L, leaf_n, OL, GOL, OL // GOL


def preband_count(lp: TrlweParams, nlimbs: int = BK_NLIMBS,
                  depth: int = 0) -> int:
    """How many dot steps' band planes to precompute (CUFHE_PREBAND env,
    clamped to the step count). 0 = off (default): bands are sheared in
    VMEM by the kernel. >0 trades HBM (~3 MB x count x n0 at the 128-bit
    set) for removing the in-kernel band-build VPU work of those steps —
    the planes stream HBM->VMEM by DMA instead."""
    pbc = int(os.environ.get("CUFHE_PREBAND", "0") or 0)
    if pbc <= 0:
        return 0
    _, _, L, _, _, _, NG = band_grouping(lp, nlimbs, depth)
    return min(pbc, L * NG)


def prepare_prebands(wext, params: GateParams, nlimbs: int = BK_NLIMBS,
                     depth: int = 0, count: int = 1):
    """Assemble the first `count` dot steps' band-window planes on device.

    The kernel's build() turns pre-rotated wext columns into the stacked
    Toeplitz band operator a_ref[oo*leaf_n + y, (R*I + q)*128 + jj] =
    gen_{p0+oo*I+q}[(leaf_n - 128*R + y - jj) mod W_g] with VPU rolls and
    concats each iteration; this computes the identical planes once from
    the resident wext with one XLA gather per step (device-side — the
    planes are ~128/BK_COPIES x the wext size, far too big to ship
    through the host).

    Returns a tuple of `count` [n0, GOL*leaf_n, I*leaf_n] int8 device
    arrays (one per dot step, in kernel step order).
    """
    lp = params.lvl1
    nd, I, L, leaf_n, OL, GOL, NG = band_grouping(lp, nlimbs, depth)
    steps = [(v, g) for v in range(L) for g in range(NG)]
    count = min(count, len(steps))
    R_L = leaf_n // 128
    W_g = 2 * leaf_n
    C = BK_COPIES
    n0 = wext.shape[0]
    R = np.arange(R_L)[:, None, None]
    y = np.arange(leaf_n)[None, :, None]
    jj = np.arange(128)[None, None, :]
    # idx passed as a jit argument, not closed over: closures bake into
    # the compiled HLO shipped per-compile through the tunnel (CLAUDE.md)
    idx = jnp.asarray(((leaf_n - 128 * R + y - jj) % W_g)
                      .astype(np.int32).reshape(-1))

    @functools.partial(jax.jit, static_argnums=(2,))
    def expand(w, ix, p0):
        gens = jax.lax.slice(w, (0, 0, C * p0),
                             (n0, W_g, C * (p0 + GOL * I)),
                             (1, 1, C))                  # [n0, W_g, GOL*I]
        out = jnp.take(gens, ix, axis=1)      # [n0, R_L*leaf_n*128, GOL*I]
        out = out.reshape(n0, R_L, leaf_n, 128, GOL, I)
        return (out.transpose(0, 4, 2, 1, 5, 3)
                   .reshape(n0, GOL * leaf_n, R_L * I * 128))

    return tuple(expand(wext, idx, (v * OL + g * GOL) * I)
                 for v, g in steps[:count])


def kar_depth(lp: TrlweParams, nlimbs: int = BK_NLIMBS) -> int:
    """Block-Karatsuba depth for a parameter set.

    Leaf operands sum 2^d decomposition digits, so the digit magnitude
    times 2^d must fit int8; leaves must be at least one 128-lane block.
    The governing magnitude is the *sub-digit* width dbits from
    decomp_digit_limb_plan (== Bgbit when digits already fit int8): the
    digit-limb split of Bg > 256 sets (USE_80BIT_SECURITY's Bg=1024) and
    the Karatsuba recursion are both exact linear rearrangements mod 2^32
    and compose — sub-digits |d| < 2^(dbits-1) sum to < 2^(dbits-1+depth),
    and the pre-scaled generators (prepare_wext) are combined into leaf
    generators the same way as unscaled ones. With every (component, limb)
    operator stacked into one MXU dot per leaf, depth 2 keeps full MXU
    efficiency and its 9/16-MAC reduction wins outright (measured 152 ms
    vs 190 ms per 1024 gates at the 128-bit set; the 80-bit Bg=1024 set
    gains the same 9/16 via the composed path). Overridable with
    CUFHE_KAR_DEPTH (benchmark A/B)."""
    env = os.environ.get("CUFHE_KAR_DEPTH", "")
    dbits = decomp_digit_limb_plan(lp.Bgbit)[1]
    d = min(2, 8 - dbits, lp.nbit - 7)
    if env:
        d = min(int(env), 8 - dbits, lp.nbit - 7)
    if nlimbs < BK_NLIMBS:
        # The dropped-limb error of 'pallas3' multiplies with the Karatsuba
        # digit sums (2^depth): measured phase noise 2^26.8 at depth 2 vs
        # 2^25.0 at depth 0 (exact: 2^24.85) — depth>0 would push XOR-class
        # gates with two bootstrapped inputs past their decision margin.
        # Karatsuba stays exact-mode-only for reduced-precision keys, even
        # under the CUFHE_KAR_DEPTH override.
        d = 0
    return max(0, d)


def _leaf_paths(depth: int):
    """Leaves of the Karatsuba tree in v-index order; path entries:
    1 = central A (operand x_l + x_r, output both halves),
    2 = B - A     (operand x_r,       output top half),
    3 = C - A     (operand x_l,       output bottom half)."""
    paths = [()]
    for _ in range(depth):
        paths = [p + (v,) for p in paths for v in (1, 2, 3)]
    return paths


def _leaf_quarters(path, depth: int):
    """Output chunk indices (of 2^depth) a leaf accumulates into."""
    qs = [0]
    for v in path:
        if v == 1:
            qs = [q * 2 + h for q in qs for h in (0, 1)]
        elif v == 2:
            qs = [q * 2 for q in qs]
        else:
            qs = [q * 2 + 1 for q in qs]
    return qs


def _stagger_builds_at(seq, S: int):
    """Band-build tick schedule for one staggered sub-iteration: the band
    for an A-dot at tick t is built at tick t-2 (same iteration, off=0);
    ticks 0/1's bands were built late in the PREVIOUS body (off=1)."""
    posA = {s: t for t, (hh, s) in enumerate(seq) if hh == "A"}
    builds_at = {}
    for s, t in posA.items():
        if t >= 2:
            builds_at.setdefault(t - 2, []).append((0, s))
        else:
            builds_at.setdefault(len(seq) - 2 + t, []).append((1, s))
    return builds_at


def _stagger_schedule_ok(S: int, NBUF: int, seq, O: int) -> bool:
    """Simulate the rotating band-buffer contents over consecutive bodies
    and check every dot reads the band that is actually resident when it
    issues. Band slots alternate between two static assignments (the body
    index enters only through its parity j): even bodies use s % NBUF, odd
    bodies (O + s) % NBUF. With a bad (NBUF, O) a build for a later step
    overwrites a slot before the lagging half-B dots of an earlier
    iteration read it (real case: S=8 with NBUF=4, O=0 corrupts lanes
    [bt/2:]); safety is a property of the whole (S, NBUF, O, seq) tuple,
    so it is verified here rather than assumed."""
    builds_at = _stagger_builds_at(seq, S)
    content = {}
    content[0 % NBUF] = (0, 0)            # prologue build of step 0
    for body in range(6):                 # steady state reached by body 2
        j = body % 2
        slot = lambda s: (j * O + s) % NBUF
        slotp = lambda s: ((1 - j) * O + s) % NBUF
        for t, (hh, s) in enumerate(seq):
            if hh in ("A", "B"):
                want, sig = (body, s), slot(s)
            else:                          # Bp: iteration body-1
                want, sig = (body - 1, s), slotp(s)
            if not (body == 0 and hh == "Bp"):   # warm-up Bp is masked
                if content.get(sig) != want:
                    return False
            for off, bs in builds_at.get(t, []):
                if off == 0:
                    content[slot(bs)] = (body, bs)
                else:
                    content[slotp(bs)] = (body + 1, bs)
    return True


def _pick_stagger_buffers(S: int, seq):
    """Choose (NBUF, O): the band-buffer count and the odd-body slot
    offset, searched over candidates and accepted only when the schedule
    simulation proves every dot reads a resident band. The original
    mapping (O = S % NBUF) is preferred when safe so measured configs
    keep their exact layout; otherwise any proven offset is used — this
    is what makes S=8 (TFHEPP_80's dot-step count) staggerable at all
    (NBUF=6, O=3), where the S-derived offset has no safe buffer count
    below 8."""
    if seq is None:
        return None
    # The original divisor-derived layout first: S=9/6/4 were measured
    # with these exact buffer rotations, so keep them byte-identical.
    for d in (6, 4, 3, 2):
        if (2 * S) % d == 0 and _stagger_schedule_ok(S, d, seq, S % d):
            return d, S % d
    # Full (NBUF, O) search for shapes the original mapping cannot serve.
    # The tail (7..12, ascending = minimal VMEM) serves the block layout,
    # whose longer build->B-read band lifetimes need NBUF >= S.
    for d in (6, 4, 3, 2) + tuple(range(7, 13)):
        for O in sorted(range(d), key=lambda o: o != S % d):
            if _stagger_schedule_ok(S, d, seq, O):
                return d, O
    return None


def _stagger_seq(S: int):
    """Dot-issue order for the staggered half-tile pipeline: one body covers
    half A's S dots of iteration i and half B's S dots lagging ~S/2 behind
    (steps S-r..S-1 of iteration i-1, then 0..S-r-1 of iteration i). The
    consecutive A-run after the last Bp covers half B's serial boundary work
    (place → out update → rotate/decompose), and the trailing B-run covers
    half A's. Returns (sequence, r) or (None, 0) when S is too small to
    pipeline this way. Small S (2, 3 — e.g. CONCRETE's 3 dot steps) use
    lag 1: a thinner shadow, but the structural constraints (all Bp dots
    before the half-B fold at tick 3r-1, all B dots after) still hold and
    the band-slot safety is proven by _stagger_schedule_ok as usual."""
    r = max(2, S // 3) if S >= 4 else 1
    if S < 2 * r:
        return None, 0
    seq = []
    for j in range(r):
        seq += [("A", j), ("Bp", S - r + j)]
    if os.environ.get("CUFHE_SEQ", "lag") == "block":
        # Block layout (perf A/B): every remaining A dot issues before the
        # half-B fold, every B dot after — both folds' serial boundary
        # chains (place -> out update -> rotate/decompose) then sit behind
        # the deepest possible queue of independent dots (S - r of them,
        # vs ~r in the lag layout). Structural constraints are unchanged:
        # Bp dots all precede the fold, B dots all follow it.
        seq += [("A", r + j) for j in range(S - r)]
        seq += [("B", j) for j in range(S - r)]
        return seq, r
    seq += [("A", r + j) for j in range(r)]
    seq += [("B", j) for j in range(r)]
    seq += [("A", j) for j in range(2 * r, S)]
    seq += [("B", j) for j in range(r, S - r)]
    return seq, r


def _make_kernel(params: GateParams, nlimbs: int = BK_NLIMBS,
                 depth: int = 0, b_tile: int = 256, want_stagger=None,
                 preband: int = 0):
    _skip = os.environ.get("CUFHE_PALLAS_SKIP", "")  # debug: 'mxu'|'rot'|'shear'
    lp = params.lvl1
    N, nbit, k, l, Bgbit = lp.n, lp.nbit, lp.k, lp.l, lp.Bgbit
    n0 = params.lvl0.dim
    # Large gadget bases (USE_80BIT_SECURITY's Bg=1024, CMakeLists.txt:8-12)
    # split each centered digit into nd balanced int8 sub-digits; the 2^dbits
    # scaling of sub-digit dl lives in its pre-scaled key generator
    # (prepare_wext), so the MXU contraction and limb recombination are
    # unchanged — dec rows just multiply by nd.
    nd, I, L, leaf_n, OL, GOL, NG = band_grouping(lp, nlimbs, depth)
    dbits = decomp_digit_limb_plan(Bgbit)[1]
    C = BK_COPIES
    R_L = leaf_n // 128
    W_g = 2 * leaf_n                   # leaf band width
    assert (1 << (min(Bgbit, dbits) - 1)) << depth <= 128, \
        "Karatsuba depth overflows int8 digit sums"
    assert leaf_n >= 128
    G = (k + 1) * nlimbs * L * I       # distinct leaf generators / iteration
    paths = _leaf_paths(depth)
    quarters = [_leaf_quarters(p, depth) for p in paths]
    #: PB: the first PB dot steps read DMA'd precomputed band planes
    #: (prepare_prebands) instead of in-kernel sheared bands.
    PB = preband
    # 3 rotating window buffers: build(si+1) must not wait on the still-
    # in-flight dot(si-1) that read the third buffer
    NBUF = 3
    drop_sh = BK_NLIMBS - nlimbs
    off_const = np.uint32((lp.decomp_offset + lp.decomp_roundoffset)
                          % (1 << 32))
    dmask = np.uint32((1 << Bgbit) - 1)
    half = np.int32(1 << (Bgbit - 1))
    dbase = np.int32(1 << dbits)
    dhalf = np.int32(1 << (dbits - 1))

    S = L * NG
    steps = [(v, g) for v in range(L) for g in range(NG)]
    # Staggered half-tile pipeline (see _stagger_seq): requires a schedule,
    # static band slots under an unroll-by-2 body ((2S) % NBUF == 0), and
    # lanes that split into two >=128 halves. CUFHE_STAGGER=0 disables
    # (perf A/B); section-skip debug modes use the plain schedule.
    seq, r_lag = _stagger_seq(S)
    # Band-buffer count + odd-body slot offset, proven safe by schedule
    # simulation (see _pick_stagger_buffers); shapes with no safe layout
    # fall back to the plain schedule rather than risk slot corruption.
    picked = _pick_stagger_buffers(S, seq)
    env_nbuf = os.environ.get("CUFHE_NBUF", "")   # perf A/B only
    if env_nbuf and seq is not None:
        d = int(env_nbuf)
        # honor the override only when the simulator proves a safe offset
        safe = next((O for O in sorted(range(d), key=lambda o: o != S % d)
                     if _stagger_schedule_ok(S, d, seq, O)), None)
        picked = (d, safe) if safe is not None else picked
    if want_stagger is None:
        want_stagger = os.environ.get("CUFHE_STAGGER", "1") == "1"
    # Section-skip debug modes default to the plain schedule;
    # CUFHE_SKIP_STAGGER=1 keeps the staggered schedule during skip
    # profiling so its section exposure can be measured directly.
    skip_ok = not _skip or os.environ.get("CUFHE_SKIP_STAGGER") == "1"
    # Precomputed band planes are wired into the plain schedule only: the
    # staggered layout's band slots are exactly the work prebands remove,
    # and the two optimizations' VMEM budgets do not compose.
    # On real TPUs the tile must also be >= 512: the half-tile reads at
    # lane offset H = b_tile/2 feed dynamic-row loads
    # (abar_ref[pl.ds(idx, 1), H:]) that Mosaic only compiles at lane
    # offsets that are multiples of 256 — H = 128 fails with "dynamic
    # load with unaligned indices" (measured on v5e at batch 256).
    # Smaller tiles take the plain schedule, which always reads
    # full-width rows at offset 0. Interpret mode (CPU tests) has no
    # such limit, so bt=256 keeps covering the staggered code path there.
    tile_ok = b_tile % 256 == 0 and (
        b_tile >= 512 or jax.default_backend() != "tpu")
    stagger = (seq is not None and picked is not None and skip_ok
               and tile_ok and want_stagger and PB == 0)
    NBUF, O_ST = picked if stagger else (3, 0)
    # Placement-queue depth (perf A/B): how many issued-but-unplaced dot
    # results ride between the MXU and the VPU placement adds. Correctness
    # is depth-independent (folds flush their half first); deeper queues
    # widen the MXU shadow over VPU work at the cost of live int32 result
    # tiles in VMEM.
    PEND = max(1, int(os.environ.get("CUFHE_PEND", "2")))

    def kernel(abar_ref, acc_in_ref, wext_hbm, pbs, out_ref,
               dec_ref, a_ref, wbuf_ref, sem_ref, pre_ref, psem_ref,
               upd_ref):
        Bt = out_ref.shape[1]

        def dma(i, slot):
            return pltpu.make_async_copy(
                wext_hbm.at[i], wbuf_ref.at[slot], sem_ref.at[slot])

        def dma_pre(i, parity, si):
            """Band plane of dot step si, iteration i: HBM -> VMEM slot
            (parity, si). Double-buffered across iterations so a plane is
            never overwritten while the previous iteration's dot may still
            be reading it."""
            return pltpu.make_async_copy(
                pbs[si].at[i], pre_ref.at[parity, si],
                psem_ref.at[parity, si])

        subl = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

        def rotdec(idx, lo, W, mask=None):
            """Rotate each component by X^abar[idx], decompose digits, and
            write the Karatsuba leaf operands into dec_ref[:, lo:lo+W].
            dec_ref row layout is (leaf v, R, poly r, offset): each leaf
            operand is scattered into R_L chunks of 128 rows so the
            contraction index pairs with the band-window column order
            assembled by build(). mask (traced bool) zeroes the digits so
            out-of-range pipeline iterations contribute exact zeros."""
            ab = abar_ref[pl.ds(idx, 1), lo:lo + W].astype(jnp.int32)
            hi = ((ab >> nbit) & 1).astype(jnp.bool_)
            low = ab & (N - 1)
            for j in range(k + 1):
                # debug 'chain': source rot/dec from the loop-invariant
                # input block — same VPU work, no serial accumulator
                # dependency; measures the cross-iteration pipelining
                # ceiling (timing only, breaks correctness)
                src = acc_in_ref if _skip == "chain" else out_ref
                acc_j = src[j * N:(j + 1) * N, lo:lo + W]  # [N, W] uint32
                x = acc_j
                for kb in range(0 if _skip == "rot" else nbit):
                    rolled = pltpu.roll(x, 1 << kb, axis=0)
                    x = jnp.where(((ab >> kb) & 1).astype(jnp.bool_),
                                  rolled, x)
                neg = (subl < low) ^ hi                    # [N, W]
                rot = jnp.where(neg, jnp.negative(x), x)
                temp = rot - acc_j + off_const
                for d in range(l):
                    sh = np.uint32(32 - (d + 1) * Bgbit)
                    # leaf sums in int32 (Mosaic has no int8 vector adds);
                    # magnitudes stay int8-safe by the depth/Bgbit gate.
                    dig32 = ((temp >> sh) & dmask).astype(jnp.int32) - half
                    if mask is not None:
                        dig32 = jnp.where(mask, dig32,
                                          jnp.zeros_like(dig32))
                    for dl in range(nd):
                        if dl == nd - 1:
                            part = dig32   # remainder fits (plan headroom)
                        else:
                            part = (((dig32 + dhalf) & (dbase - np.int32(1)))
                                    - dhalf)
                            dig32 = (dig32 - part) >> np.int32(dbits)
                        rr = (j * l + d) * nd + dl
                        nodes = {(): part}
                        for _lev in range(depth):
                            nxt = {}
                            for path, vec in nodes.items():
                                hn = vec.shape[0] // 2
                                vlo, vhi = vec[:hn, :], vec[hn:, :]
                                nxt[path + (1,)] = vlo + vhi
                                nxt[path + (2,)] = vhi
                                nxt[path + (3,)] = vlo
                            nodes = nxt
                        for v, path in enumerate(paths):
                            lv = nodes[path]               # [leaf_n, W]
                            base = v * (I * leaf_n)
                            for R in range(R_L):
                                row = base + (R * I + rr) * 128
                                dec_ref[row:row + 128, lo:lo + W] = \
                                    lv[128 * R:128 * (R + 1), :] \
                                    .astype(jnp.int8)

        # ---- external product, leaf-major. Every (component, limb)
        # operator contracts against the SAME leaf operand, so their
        # band windows stack along MXU output rows: one deep dot per
        # (leaf, component-limb group). Bands for upcoming dots are
        # sheared and window-assembled into rotating a_ref buffers in
        # the shadow of issued dots, hiding the VPU band work under
        # MXU time.
        def build(v, g, buf, wslot):
            if _skip == "shear":
                return
            Pw = pltpu.bitcast(wbuf_ref[wslot], jnp.int32)
            p0 = (v * OL + g * GOL) * I
            base = Pw[:, C * p0:C * (p0 + GOL * I)]
            # Duplicate d of a poly's C pre-rotated columns sits at
            # in-block offset C*d — a STATIC roll by C*d/4 packed rows.
            # Static rolls over the unique columns replace the former
            # log-shear (conditional roll+select over the duplicated
            # 128-wide blocks): no selects, ~7x less roll traffic.
            # (Direct window assembly from row-shifted slices would
            # halve the materialized volume again, but Mosaic requires
            # concat operands to share sublane offsets — C*d/4 is not
            # tile-aligned for odd d.)
            rolled = [base] + [pltpu.roll(base, (C * d) // 4, axis=0)
                               for d in range(1, 128 // C)]
            cols = []
            for q in range(GOL * I):
                for d in range(128 // C):
                    cols.append(rolled[d][:, C * q:C * (q + 1)])
            P = jnp.concatenate(cols, axis=1)      # [Wg/4, GOL*I*128]
            # write 128-aligned row windows straight from the packed
            # view (rows/4) — no intermediate band buffer
            for oo in range(GOL):
                for R in range(R_L):
                    win = P[(leaf_n - 128 * R) // 4:
                            (2 * leaf_n - 128 * R) // 4,
                            oo * (I * 128):(oo + 1) * (I * 128)]
                    a_ref[buf, oo * leaf_n:(oo + 1) * leaf_n,
                          R * (I * 128):(R + 1) * (I * 128)] = \
                        pltpu.bitcast(win, jnp.int8)

        def dot(v, g, buf, lo, W, operand=None):
            if _skip == "mxu":
                return jnp.zeros((GOL * leaf_n, W), jnp.int32)
            return jax.lax.dot_general(
                a_ref[buf] if operand is None else operand,
                dec_ref[v * (I * leaf_n):(v + 1) * (I * leaf_n), lo:lo + W],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def plain_body(i, carry, par=None, mask=None):
            """One blind-rotation iteration, full batch tile at once.

            par: static wbuf/preband parity when the loop is unrolled by 2
            (PB > 0) — preband dots index pre_ref[par, si] statically.
            mask: traced validity bool for the overshoot body of an odd-n0
            unrolled loop (digits zeroed -> exact-zero contribution)."""
            slot = jax.lax.rem(i, 2) if par is None else par

            @pl.when(i + 1 < n0)
            def _():
                if PB < S:
                    dma(i + 1, 1 - slot).start()
                for si in range(PB):
                    dma_pre(i + 1, 1 - par, si).start()

            if PB < S:
                @pl.when(i < n0)
                def _():
                    dma(i, slot).wait()
            rotdec(i, 0, Bt, mask=mask)

            if PB == 0:
                build(0, 0, 0, slot)
            # per-(component, output-chunk) u32 accumulators (limb shifts
            # folded in as results arrive — smaller live state than per-
            # (component, limb) int32 chunks)
            updq = [[jnp.zeros((leaf_n, Bt), jnp.uint32)
                     for _ in range(1 << depth)] for _ in range(k + 1)]

            def place(v, g, p32):
                for oo in range(GOL):
                    ol = g * GOL + oo
                    o, li = divmod(ol, nlimbs)
                    slu = (p32[oo * leaf_n:(oo + 1) * leaf_n, :]
                           .astype(jnp.uint32)
                           << np.uint32(BK_LIMB_BITS * (li + drop_sh)))
                    for q in quarters[v]:
                        updq[o][q] = updq[o][q] + slu

            # Placement of step si's result is deferred until step si+1's
            # dot has been issued, so the MXU never waits behind the VPU
            # placement adds; band building likewise runs in the shadow.
            pending = None
            for si, (v, g) in enumerate(steps):
                if si < PB:
                    @pl.when(i < n0)
                    def _(si=si):
                        dma_pre(i, par, si).wait()
                    p32 = dot(v, g, 0, 0, Bt, operand=pre_ref[par, si])
                else:
                    p32 = dot(v, g, si % NBUF, 0, Bt)
                if PB <= si + 1 < len(steps):
                    build(*steps[si + 1], (si + 1) % NBUF, slot)
                if pending is not None:
                    place(*pending)
                pending = (v, g, p32)
            place(*pending)
            for o in range(k + 1):
                pfull = (updq[o][0] if depth == 0
                         else jnp.concatenate(updq[o], axis=0))
                out_ref[o * N:(o + 1) * N, :] += pfull
            return carry

        def place_ref(v, g, p32, lo, W):
            """Accumulate one dot result into upd_ref (limb shift folded)."""
            for oo in range(GOL):
                ol = g * GOL + oo
                o, li = divmod(ol, nlimbs)
                slu = (p32[oo * leaf_n:(oo + 1) * leaf_n, :]
                       .astype(jnp.uint32)
                       << np.uint32(BK_LIMB_BITS * (li + drop_sh)))
                for q in quarters[v]:
                    row = o * N + q * leaf_n
                    upd_ref[row:row + leaf_n, lo:lo + W] = \
                        upd_ref[row:row + leaf_n, lo:lo + W] + slu

        def stagger_sub(it, j, H):
            """One staggered sub-iteration: half A's S dots of iteration
            `it` interleaved (per _stagger_seq) with half B's dots of
            iterations it-1/it, each half's serial place -> out-update ->
            rotate/decompose chain running in the shadow of the other
            half's queued MXU dots. j = it & 1 (static), so band slots,
            wbuf slots, and dec lanes are compile-time constants."""
            # A/B dots of iteration `it` are masked past the end; the
            # warm-up Bp dots of "iteration -1" need no mask — the
            # prologue zeroes half B's dec plane, so they contribute
            # exact zeros.
            maskA = it < n0
            slot = lambda s: (j * O_ST + s) % NBUF        # bands of iter it
            slotp = lambda s: ((1 - j) * O_ST + s) % NBUF  # it-1 / it+1

            @pl.when(it + 1 < n0)
            def _():
                dma(it + 1, 1 - j).start()

            # shadow-task ticks (emitted after that tick's dot issues);
            # the same mapping feeds _stagger_schedule_ok's safety check
            builds_at = _stagger_builds_at(seq, S)
            first_next = min(t for t, bs in builds_at.items()
                             if any(off for off, _ in bs))
            # the half-B fold sits just before the first B dot (which needs
            # the dec plane the fold's rotdec produces), after the covering
            # A-run — in both the lag and block layouts
            h1_tick = min(t for t, (hh, _) in enumerate(seq)
                          if hh == "B") - 1
            h0_tick = len(seq) - 1

            def flush_half(pend, lo):
                """Apply (and drop) every pending placement targeting the
                half that starts at `lo` — its fold is about to read
                upd_ref, so those adds must land first. Placements are
                exact u32 adds, so applying them out of queue order is
                semantics-preserving."""
                keep = []
                for p in pend:
                    (place_ref(*p) if p[3] == lo else keep.append(p))
                return keep

            pend = []
            for t, (hh, s) in enumerate(seq):
                v, g = steps[s]
                if hh == "A":
                    pend.append((v, g, dot(v, g, slot(s), 0, H), 0, H))
                elif hh == "B":
                    pend.append((v, g, dot(v, g, slot(s), H, H), H, H))
                else:                           # Bp: iteration it-1
                    pend.append((v, g, dot(v, g, slotp(s), H, H), H, H))
                if t == first_next - 1:
                    # bands for it+1 read the other wbuf slot
                    @pl.when(it + 1 < n0)
                    def _():
                        dma(it + 1, 1 - j).wait()
                for off, bs in builds_at.get(t, []):
                    if off == 0:
                        build(*steps[bs], slot(bs), j)
                    else:
                        build(*steps[bs], slotp(bs), 1 - j)
                if len(pend) > PEND:
                    place_ref(*pend.pop(0))
                if t == h1_tick:
                    # half B finished iteration it-1: fold its update,
                    # then rotate/decompose its iteration `it` — all in
                    # the shadow of the just-issued A-run
                    pend = flush_half(pend, H)
                    out_ref[:, H:] += upd_ref[:, H:]
                    upd_ref[:, H:] = jnp.zeros((KP1N_, Bt - H), jnp.uint32)
                    rotdec(it, H, H, mask=maskA)
                if t == h0_tick:
                    # half A finished iteration it: fold + advance to it+1
                    # in the shadow of the trailing B-run
                    pend = flush_half(pend, 0)
                    out_ref[:, :H] += upd_ref[:, :H]
                    upd_ref[:, :H] = jnp.zeros((KP1N_, H), jnp.uint32)
                    rotdec(it + 1, 0, H, mask=it + 1 < n0)
            while pend:
                place_ref(*pend.pop(0))

        if not stagger:
            if PB:
                # unroll by 2: preband dots index pre_ref[par, si] with a
                # static parity. The even body's index 2m <= n0-1 always;
                # the odd body only overshoots (and needs its digits
                # masked to zero) when n0 is odd — mask=None otherwise so
                # the hot loop carries no dead selects.
                def body2(m, c):
                    plain_body(2 * m, c, par=0)
                    plain_body(2 * m + 1, c, par=1,
                               mask=(2 * m + 1 < n0) if n0 % 2 else None)
                    return c
                jax.lax.fori_loop(0, (n0 + 1) // 2, body2, 0)
            else:
                jax.lax.fori_loop(0, n0, plain_body, 0)
        else:
            H = Bt // 2
            dma(0, 0).start()
            out_ref[:, :] = acc_in_ref[:, :]
            upd_ref[:, :] = jnp.zeros((KP1N_, Bt), jnp.uint32)
            dec_ref[:, H:] = jnp.zeros((dec_ref.shape[0], Bt - H), jnp.int8)
            dma(0, 0).wait()
            rotdec(0, 0, H, mask=jnp.bool_(n0 > 0))
            build(*steps[0], 0, 0)              # band (0, 0)

            def body(m, carry):
                stagger_sub(2 * m, 0, H)
                stagger_sub(2 * m + 1, 1, H)
                return carry

            jax.lax.fori_loop(0, (n0 + 2) // 2, body, 0)

    KP1N_ = (k + 1) * N

    def kernel_entry(*refs):
        # operand order: 3 inputs, PB preband inputs, output, then scratch
        # (dec, bands, key buffer, key sem, then preband or stagger extras)
        abar_ref, acc_in_ref, wext_hbm = refs[:3]
        pbs = refs[3:3 + PB]
        out_ref = refs[3 + PB]
        dec_ref, a_ref, wbuf_ref, sem_ref = refs[4 + PB:8 + PB]
        rest = refs[8 + PB:]
        pre_ref, psem_ref = (rest[0], rest[1]) if PB else (None, None)
        upd_ref = rest[0] if stagger else None
        if not stagger:
            # prologue for the plain schedule
            if PB < S:
                pltpu.make_async_copy(
                    wext_hbm.at[0], wbuf_ref.at[0], sem_ref.at[0]).start()
            for si in range(PB):
                pltpu.make_async_copy(
                    pbs[si].at[0], pre_ref.at[0, si],
                    psem_ref.at[0, si]).start()
            out_ref[:, :] = acc_in_ref[:, :]
        kernel(abar_ref, acc_in_ref, wext_hbm, pbs, out_ref,
               dec_ref, a_ref, wbuf_ref, sem_ref, pre_ref, psem_ref,
               upd_ref)

    return kernel_entry, dict(N=N, n0=n0, k=k, I=I, G=G, W_g=W_g, L=L,
                              leaf_n=leaf_n, GOL=GOL, NBUF=NBUF, O=O_ST,
                              stagger=stagger, PB=PB, S=S)


@functools.partial(jax.jit,
                   static_argnames=("params", "b_tile", "nlimbs", "depth",
                                    "stagger"))
def blind_rotate_pallas(acc_init: jnp.ndarray, abar: jnp.ndarray,
                        wext: jnp.ndarray, params: GateParams,
                        b_tile: int = 256,
                        nlimbs: int = BK_NLIMBS,
                        depth: int = 0,
                        stagger: bool = None,
                        prebands: tuple = ()) -> jnp.ndarray:
    """Run the fused blind rotation.

    acc_init: [B, k+1, N] uint32 — rotated test vector (batched_test_vector).
    abar:     [n0_pad, B] uint32 — per-iteration rotation indices
              (iteration-major; rows >= n0 ignored).
    wext:     [n0, W_g, C*G] int8 — pre-rotated leaf-generator limb bands
              (prepare_wext with the same nlimbs/depth).
    prebands: optional tuple of [n0, GOL*leaf_n, I*leaf_n] int8 planes
              (prepare_prebands): the first len(prebands) dot steps DMA
              these instead of shearing bands in VMEM.
    Returns [B, k+1, N] uint32.
    """
    lp = params.lvl1
    if lp.n % 128:
        raise NotImplementedError("pallas backend requires N % 128 == 0")
    B = acc_init.shape[0]
    bt = min(b_tile, B)
    assert B % bt == 0, (B, bt)
    PB = len(prebands)
    kernel, dims = _make_kernel(params, nlimbs, depth, b_tile=bt,
                                want_stagger=stagger, preband=PB)
    N, k, n0 = dims["N"], dims["k"], dims["n0"]
    I, L, leaf_n, W_g = dims["I"], dims["L"], dims["leaf_n"], dims["W_g"]
    assert wext.shape[1] == W_g, (wext.shape, W_g, "wext/depth mismatch")
    assert PB <= dims["S"], (PB, dims["S"])
    for pb in prebands:
        assert pb.shape == (n0, dims["GOL"] * leaf_n, I * leaf_n), \
            (pb.shape, "preband/kernel shape mismatch")
    KP1N = (k + 1) * N

    acc_t = acc_init.reshape(B, KP1N).T               # [(k+1)N, B]

    grid = (B // bt,)
    interp = jax.default_backend() != "tpu"
    scratch = [
        pltpu.VMEM((L * I * leaf_n, bt), jnp.int8),  # leaf operands
        pltpu.VMEM((dims["NBUF"], dims["GOL"] * leaf_n, I * leaf_n),
                   jnp.int8),                        # stacked band windows
        pltpu.VMEM((2, W_g, wext.shape[2]), jnp.int8),  # key buffer
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if dims["stagger"]:
        # per-iteration update accumulator (same row space as out_ref);
        # persists across fori bodies so each half's placements can span
        # the staggered sub-iteration boundary
        scratch.append(pltpu.VMEM((KP1N, bt), jnp.uint32))
    if PB:
        # double-buffered precomputed band planes + per-plane DMA sems
        scratch.append(pltpu.VMEM((2, PB, dims["GOL"] * leaf_n,
                                   I * leaf_n), jnp.int8))
        scratch.append(pltpu.SemaphoreType.DMA((2, PB)))
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((abar.shape[0], bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP1N, bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * PB,
        out_specs=pl.BlockSpec((KP1N, bt), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KP1N, B), jnp.uint32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the staggered schedule needs 6 band buffers + the update
            # accumulator; 117M measured at the 128-bit set (hard cap 128M).
            # CUFHE_VMEM_MB overrides for perf A/B (e.g. deeper CUFHE_PEND
            # placement queues need ~1 MB more than the default budget).
            vmem_limit_bytes=int(os.environ.get(
                "CUFHE_VMEM_MB",
                "120" if dims["stagger"] or PB else "110")) * 1024 * 1024,
        ),
        interpret=interp,
    )(abar, acc_t, wext, *prebands)
    return out_t.T.reshape(B, k + 1, N)


# ---------------------------------------------------------------------------
# Key preparation for this kernel
# ---------------------------------------------------------------------------

def _child_exts(h_ext: np.ndarray):
    """Karatsuba children of an extended Toeplitz generator (u32, exact
    mod 2^32). h_ext[..., u] = h[u - m] for a size-m operator (shape 2m);
    returns [A, B-A, C-A] extended generators of size m (operators m/2)."""
    m = h_ext.shape[-1] // 2
    A = h_ext[..., m // 2: m // 2 + m]
    return [A, h_ext[..., :m] - A, h_ext[..., m:] - A]


def prepare_wext(bk: np.ndarray, params: GateParams,
                 nlimbs: int = BK_NLIMBS, depth: int = 0) -> np.ndarray:
    """BK [n0, (k+1)l, k+1, N] uint32 -> wext [n0, W_g, C*G] int8.

    Column C*p+c (C = BK_COPIES, p = (v*OL + o*nlimbs + li)*I + j,
    OL = (k+1)*nlimbs — leaf-major so stacked-output dots read contiguous
    column blocks) holds the limb-decomposed extended generator of
    Karatsuba leaf v of key poly (j, o), limb li, pre-rotated down by c —
    the low log2(C) bits of the in-kernel shear, pre-applied so the kernel
    finishes the per-column rotation with only log2(128/C) packed-int32
    rolls.

    The negacyclic extension and all Karatsuba generator combinations are
    computed in uint32 (exact mod 2^32) *before* balanced limb
    decomposition: the limbed columns sum back to the combined generator
    exactly, every digit fits int8 with 4 limbs, and band windows start at
    128-aligned rows (extension offset leaf_n).

    Bgbit > 8 parameter sets (Bg=1024) get nd sub-digit rows per gadget
    digit: dec row (r, dl) contracts against the generator bk[r] << dbits*dl
    (scaled here in uint32, exact), so the kernel's contraction shape just
    grows by nd with no recombination change.
    """
    from .limbs import u32_to_signed_limbs

    n0, I0, kp1, N = bk.shape
    nd, dbits = decomp_digit_limb_plan(params.lvl1.Bgbit)
    if nd > 1:
        scaled = np.empty((n0, I0 * nd, kp1, N), dtype=np.uint32)
        for r in range(I0):
            for dl in range(nd):
                scaled[:, r * nd + dl] = bk[:, r] << np.uint32(dbits * dl)
        bk = scaled
    I = I0 * nd
    C = BK_COPIES
    L = 3 ** depth
    leaf_n = N >> depth
    W_g = 2 * leaf_n
    ext = np.empty((n0, I, kp1, 2 * N), dtype=np.uint32)
    ext[..., :N] = np.zeros_like(bk) - bk
    ext[..., N:] = bk
    leaf_exts = [ext]
    for _ in range(depth):
        leaf_exts = [c for e in leaf_exts for c in _child_exts(e)]
    # [n0, I, kp1, L, W_g]
    leaves = np.stack(leaf_exts, axis=3)
    limbs = u32_to_signed_limbs(leaves, nlimbs=BK_NLIMBS, bits=BK_LIMB_BITS)
    drop = BK_NLIMBS - nlimbs          # keep only the top `nlimbs` limbs
    G = kp1 * nlimbs * L * I
    gp = -(-(C * G) // 128) * 128      # lane-align for DMA
    wext = np.zeros((n0, W_g, gp), dtype=np.int8)
    OL = kp1 * nlimbs
    # all C pre-rotated copies of a polynomial in one gather
    rollidx = (np.arange(W_g)[None, :] - np.arange(C)[:, None]) % W_g
    for v in range(L):
        for o in range(kp1):
            for li in range(nlimbs):
                for j in range(I):
                    p = (v * OL + o * nlimbs + li) * I + j
                    base = limbs[:, j, o, v, :, drop + li]  # [n0, W_g]
                    wext[:, :, C * p:C * (p + 1)] = \
                        base[:, rollidx].transpose(0, 2, 1)
    return wext
