"""Fused Pallas blind-rotation kernel — the speed-of-light core.

One pallas_call runs the *entire* n0-iteration CMUX accumulator loop
(the reference's per-gate fused kernel, __BlindRotate__ + Accumulate,
gatebootstrapping_gpu.cuh:287-314/115-285) for a batch tile:

  * the TRLWE accumulator stays in VMEM for all n0 iterations,
  * the limb-decomposed bootstrapping key streams HBM→VMEM with a
    double-buffered async DMA per iteration,
  * the negacyclic monomial rotation is a barrel shifter (nbit conditional
    static sublane rolls + one sign select — no gathers),
  * the external product runs on the MXU as one *deep* int8 dot per
    (output component, key limb): Toeplitz bands Mt[u, r] = w[(u - r) mod 2N]
    are generated in VMEM by a log-depth shear (5 conditional rolls on a
    packed int32 view), their 128-aligned row windows are assembled into a
    single [N, I*N] operator, and the decomposed digits (laid out in matching
    (window, poly, offset) row order) contract against it in one
    contraction-depth-I*N matmul — minimizing VPU accumulate traffic between
    MXU calls.

Layout: everything in the kernel is 2-D with the *batch on lanes* and the
polynomial coefficient axis on sublanes — the layout Mosaic vectorizes
cleanly, and it puts N (not the batch tile) on the MXU row dimension.

This replaces the reference NTT entirely: the MXU makes exact direct
negacyclic convolution (bit-identical to the large-modulus NTT path) faster
than a translated prime-field butterfly network would be.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import GateParams

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
#: traffic, at the cost of extra noise of std ~2^21 on the 2^32 torus
#: (~8% variance on top of the inherent blind-rotation noise at the 128-bit
#: set; >100 sigma of decryption margin). Not bit-exact vs the golden model.
BK_NLIMBS = 4
BK_LIMB_BITS = 8

#: Pre-rotated copies of each extended key polynomial stored in HBM. The
#: in-kernel shear that turns a key column into a Toeplitz band needs one
#: conditional roll per column-index bit not covered by a pre-rotated copy;
#: 16 copies leave only 3 rolls (bits 4..6 of the 128 band columns) at the
#: cost of 16x key HBM (~1 GiB at the 128-bit set) and negligible DMA.
#: (Measured: 32 copies is not faster and doubles key HBM/prep time.)
BK_COPIES = 16


def _make_kernel(params: GateParams, nlimbs: int = BK_NLIMBS):
    import os
    _skip = os.environ.get("CUFHE_PALLAS_SKIP", "")  # debug: 'mxu'|'rot'|'shear'
    lp = params.lvl1
    N, nbit, k, l, Bgbit = lp.n, lp.nbit, lp.k, lp.l, lp.Bgbit
    n0 = params.lvl0.dim
    I = (k + 1) * l
    C = BK_COPIES
    drop = BK_NLIMBS - nlimbs         # low limbs dropped ('pallas3' mode)
    G = (k + 1) * nlimbs * I          # distinct key polys per iteration
    W = 2 * N                          # band width
    R_BLOCKS = N // 128
    off_const = np.uint32((lp.decomp_offset + lp.decomp_roundoffset)
                          % (1 << 32))
    dmask = np.uint32((1 << Bgbit) - 1)
    half = np.int32(1 << (Bgbit - 1))

    def kernel(abar_ref, acc_in_ref, wext_hbm, out_ref,
               dec_ref, m_ref, a_ref, wbuf_ref, sem_ref):
        Bt = out_ref.shape[1]

        def dma(i, slot):
            return pltpu.make_async_copy(
                wext_hbm.at[i], wbuf_ref.at[slot], sem_ref.at[slot])

        dma(0, 0).start()
        out_ref[:, :] = acc_in_ref[:, :]

        subl = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        # Band-column index within a poly (loop-invariant select masks).
        mlane = jax.lax.broadcasted_iota(jnp.int32, (1, I * 128), 1) & 127

        def iter_body(i, carry):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n0)
            def _():
                dma(i + 1, 1 - slot).start()

            dma(i, slot).wait()

            # ---- build all G Toeplitz bands for this iteration, once ----
            # Each key poly comes as C pre-rotated int8 copies; bitcast packs
            # 4 sublanes per int32 word so conditional rolls finish the
            # per-column rotation Mt[u, r] = w[(u - r) mod 2N] with only
            # log2(128/C) rolls, shared by every (component, limb) dot and
            # the whole batch tile.
            if _skip != "shear":
                Pw = pltpu.bitcast(wbuf_ref[slot], jnp.int32)  # [W/4, C*G]
                for ol in range((k + 1) * nlimbs):
                    cols = []
                    for j in range(I):
                        p = ol * I + j
                        cols.extend([Pw[:, C * p:C * (p + 1)]] * (128 // C))
                    P = jnp.concatenate(cols, axis=1)       # [W/4, I*128]
                    b = C
                    while b < 128:
                        rolled = pltpu.roll(P, b // 4, axis=0)
                        P = jnp.where((mlane & b) != 0, rolled, P)
                        b *= 2
                    m_ref[:, ol * (I * 128):(ol + 1) * (I * 128)] = \
                        pltpu.bitcast(P, jnp.int8)

            ab = abar_ref[pl.ds(i, 1), :].astype(jnp.int32)   # [1, Bt]
            hi = ((ab >> nbit) & 1).astype(jnp.bool_)
            lo = ab & (N - 1)

            # ---- rotate each component by X^abar; decompose digits ----
            # dec_ref row layout is (R, j, r): digit poly j is scattered into
            # R_BLOCKS chunks of 128 rows so that the contraction index pairs
            # with the band-window column order assembled in a_ref below.
            for j in range(k + 1):
                acc_j = out_ref[j * N:(j + 1) * N, :]     # [N, Bt] uint32
                x = acc_j
                for kb in range(0 if _skip == "rot" else nbit):
                    rolled = pltpu.roll(x, 1 << kb, axis=0)
                    x = jnp.where(((ab >> kb) & 1).astype(jnp.bool_),
                                  rolled, x)
                neg = (subl < lo) ^ hi                     # [N, Bt]
                rot = jnp.where(neg, jnp.negative(x), x)
                temp = rot - acc_j + off_const
                for d in range(l):
                    sh = np.uint32(32 - (d + 1) * Bgbit)
                    dig8 = (((temp >> sh) & dmask).astype(jnp.int32)
                            - half).astype(jnp.int8)
                    r = j * l + d
                    for R in range(R_BLOCKS):
                        dec_ref[(R * I + r) * 128:(R * I + r + 1) * 128, :] \
                            = dig8[128 * R:128 * (R + 1), :]

            # ---- external product: one deep banded-Toeplitz MXU dot per
            # (output component, key limb); contraction depth I*N ----
            for o in range(k + 1):
                upd = jnp.zeros((N, Bt), jnp.uint32)
                for li in range(nlimbs):
                    ol = o * nlimbs + li
                    if _skip != "shear":
                        for R in range(R_BLOCKS):
                            a_ref[:, R * (I * 128):(R + 1) * (I * 128)] = \
                                m_ref[N - 128 * R:2 * N - 128 * R,
                                      ol * (I * 128):(ol + 1) * (I * 128)]
                    if _skip == "mxu":
                        p32 = jnp.zeros((N, Bt), jnp.int32)
                    else:
                        p32 = jax.lax.dot_general(
                            a_ref[:, :], dec_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                    upd = upd + (p32.astype(jnp.uint32)
                                 << np.uint32(BK_LIMB_BITS * (li + drop)))
                out_ref[o * N:(o + 1) * N, :] += upd
            return carry

        jax.lax.fori_loop(0, n0, iter_body, 0)

    return kernel, dict(N=N, n0=n0, k=k, I=I, G=G, W=W,
                        R_BLOCKS=R_BLOCKS)


@functools.partial(jax.jit,
                   static_argnames=("params", "b_tile", "nlimbs"))
def blind_rotate_pallas(acc_init: jnp.ndarray, abar: jnp.ndarray,
                        wext: jnp.ndarray, params: GateParams,
                        b_tile: int = 256,
                        nlimbs: int = BK_NLIMBS) -> jnp.ndarray:
    """Run the fused blind rotation.

    acc_init: [B, k+1, N] uint32 — rotated test vector (batched_test_vector).
    abar:     [n0_pad, B] uint32 — per-iteration rotation indices
              (iteration-major; rows >= n0 ignored).
    wext:     [n0, 2N, G] int8 — transposed extended limb key (prepare_wext).
    Returns [B, k+1, N] uint32.
    """
    lp = params.lvl1
    if lp.Bgbit > 8:
        raise NotImplementedError("pallas backend requires Bgbit <= 8")
    if lp.n % 128:
        raise NotImplementedError("pallas backend requires N % 128 == 0")
    kernel, dims = _make_kernel(params, nlimbs)
    B = acc_init.shape[0]
    bt = min(b_tile, B)
    assert B % bt == 0, (B, bt)
    N, k, G, W, n0 = dims["N"], dims["k"], dims["G"], dims["W"], dims["n0"]
    I = dims["I"]
    KP1N = (k + 1) * N

    acc_t = acc_init.reshape(B, KP1N).T               # [(k+1)N, B]

    grid = (B // bt,)
    interp = jax.default_backend() != "tpu"
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((abar.shape[0], bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP1N, bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((KP1N, bt), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KP1N, B), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((I * N, bt), jnp.int8),       # dec, (R, j, r) rows
            pltpu.VMEM((W, G * 128), jnp.int8),      # all Toeplitz bands
            pltpu.VMEM((N, I * N), jnp.int8),        # assembled band windows
            pltpu.VMEM((2, W, wext.shape[2]), jnp.int8),  # BK double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interp,
    )(abar, acc_t, wext)
    return out_t.T.reshape(B, k + 1, N)


# ---------------------------------------------------------------------------
# Key preparation for this kernel
# ---------------------------------------------------------------------------

def prepare_wext(bk: np.ndarray, params: GateParams,
                 nlimbs: int = BK_NLIMBS) -> np.ndarray:
    """BK [n0, (k+1)l, k+1, N] uint32 -> wext [n0, 2N, 4G] int8 (transposed).

    Column C*p+c (C = BK_COPIES) holds the negacyclic-extended,
    limb-decomposed key polynomial (index-u entry wneg[u - N], so band
    windows start at 128-aligned rows) pre-rotated down by c — the low
    log2(C) bits of the in-kernel shear, pre-applied so the kernel finishes
    the per-column rotation with only log2(128/C) packed-int32 rolls.

    The negacyclic extension is built in uint32 (negation mod 2^32) *before*
    balanced limb decomposition: the limbed columns then sum back to the
    extended value exactly mod 2^32, and every digit fits int8 with only 4
    limbs (negating digits post-decomposition would overflow at -(-128)).
    """
    from .limbs import u32_to_signed_limbs

    n0, I, kp1, N = bk.shape
    C = BK_COPIES
    ext = np.empty((n0, I, kp1, 2 * N), dtype=np.uint32)
    ext[..., :N] = np.zeros_like(bk) - bk
    ext[..., N:] = bk
    limbs = u32_to_signed_limbs(ext, nlimbs=BK_NLIMBS, bits=BK_LIMB_BITS)
    drop = BK_NLIMBS - nlimbs          # keep only the top `nlimbs` limbs
    G = kp1 * nlimbs * I
    gp = -(-(C * G) // 128) * 128      # lane-align for DMA
    wext = np.zeros((n0, 2 * N, gp), dtype=np.int8)
    for o in range(kp1):
        for li in range(nlimbs):
            for j in range(I):
                p = (o * nlimbs + li) * I + j
                base = limbs[:, j, o, :, drop + li]  # [n0, 2N]
                for c in range(C):
                    wext[:, :, C * p + c] = np.roll(base, c, axis=1)
    return wext
