"""Fused Pallas blind-rotation kernel — the speed-of-light core.

One pallas_call runs the *entire* n0-iteration CMUX accumulator loop
(the reference's per-gate fused kernel, __BlindRotate__ + Accumulate,
gatebootstrapping_gpu.cuh:287-314/115-285) for a batch tile:

  * the TRLWE accumulator stays in VMEM for all n0 iterations,
  * the limb-decomposed bootstrapping key streams HBM→VMEM with a
    double-buffered async DMA per iteration,
  * the negacyclic monomial rotation is a barrel shifter (nbit conditional
    static sublane rolls + one sign select — no gathers),
  * the external product runs on the MXU as int8 dot products against
    Toeplitz *bands* generated in VMEM by a log-depth shear (7 conditional
    rolls turn the broadcast key polynomial into Mt[u, r] = w[(u - r) mod 2N],
    and every 128-column block of the full Toeplitz operator is a static
    row window of Mt — the band structure means only ~1/8 of the operator is
    ever materialized).

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

#: BK limb format for this kernel: 5 balanced base-2^7 digits. The negacyclic
#: extension *negates* digits, and -(-128) does not fit int8, so the conv
#: backend's 4x8-bit limbs are not usable here; -[-64, 63] = [-63, 64] is.
BK_NLIMBS = 5
BK_LIMB_BITS = 7


def _shear_band_t(base4: jnp.ndarray, width: int) -> jnp.ndarray:
    """[width, 4] int8 (pre-rotated copies 0..3) -> Mt [width, 128] with
    Mt[u, r] = base[(u - r) % width].

    Mosaic only rotates 32-bit vectors, so the shear works on a packed view:
    the 4 pre-rotated int8 copies bitcast to one int32 lane, which is
    broadcast to 32 lanes; 5 conditional rolls (shifts 4*2^j, selected by
    bit j of the packed-lane index) complete the per-column rotation, and a
    bitcast back yields the int8 band with column r rotated down by exactly
    r = 4*q + c.
    """
    M0 = jnp.concatenate([base4] * 32, axis=1)            # [W,128]; col r = copy r%4
    P = pltpu.bitcast(M0, jnp.int32)                      # [W//4, 128]: 4 rows/word
    lanes = jax.lax.broadcasted_iota(jnp.int32, (width // 4, 128), 1)
    for j in range(5):
        rolled = pltpu.roll(P, 1 << j, axis=0)            # 4*2^j u-steps
        P = jnp.where(((lanes >> (2 + j)) & 1).astype(jnp.bool_), rolled, P)
    return pltpu.bitcast(P, jnp.int8)                     # [width, 128]


def _make_kernel(params: GateParams):
    lp = params.lvl1
    N, nbit, k, l, Bgbit = lp.n, lp.nbit, lp.k, lp.l, lp.Bgbit
    n0 = params.lvl0.dim
    I = (k + 1) * l
    G = (k + 1) * BK_NLIMBS * I       # polys per iteration in wext
    W = 2 * N                          # band width
    R_BLOCKS = N // 128
    off_const = np.uint32((lp.decomp_offset + lp.decomp_roundoffset)
                          % (1 << 32))
    dmask = np.uint32((1 << Bgbit) - 1)
    half = np.int32(1 << (Bgbit - 1))

    def kernel(abar_ref, acc_in_ref, wext_hbm, out_ref,
               dec_ref, m_ref, part_ref, wbuf_ref, sem_ref):
        Bt = out_ref.shape[1]

        def dma(i, slot):
            return pltpu.make_async_copy(
                wext_hbm.at[i], wbuf_ref.at[slot], sem_ref.at[slot])

        dma(0, 0).start()
        out_ref[:, :] = acc_in_ref[:, :]

        subl = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

        def iter_body(i, carry):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n0)
            def _():
                dma(i + 1, 1 - slot).start()

            dma(i, slot).wait()

            ab = abar_ref[pl.ds(i, 1), :].astype(jnp.int32)   # [1, Bt]
            hi = ((ab >> nbit) & 1).astype(jnp.bool_)
            lo = ab & (N - 1)

            # ---- rotate each component by X^abar; decompose digits ----
            for j in range(k + 1):
                acc_j = out_ref[j * N:(j + 1) * N, :]     # [N, Bt] uint32
                x = acc_j
                for kb in range(nbit):
                    rolled = pltpu.roll(x, 1 << kb, axis=0)
                    x = jnp.where(((ab >> kb) & 1).astype(jnp.bool_),
                                  rolled, x)
                neg = (subl < lo) ^ hi                     # [N, Bt]
                rot = jnp.where(neg, jnp.negative(x), x)
                temp = rot - acc_j + off_const
                for d in range(l):
                    sh = np.uint32(32 - (d + 1) * Bgbit)
                    dig = ((temp >> sh) & dmask).astype(jnp.int32) - half
                    dec_ref[(j * l + d) * N:(j * l + d + 1) * N, :] = \
                        dig.astype(jnp.int8)

            # ---- external product: banded Toeplitz MXU dots ----
            for o in range(k + 1):
                upd = jnp.zeros((N, Bt), jnp.uint32)
                for li in range(BK_NLIMBS):
                    part_ref[:, :] = jnp.zeros((N, Bt), jnp.int32)
                    for j in range(I):
                        p = (o * BK_NLIMBS + li) * I + j
                        m_ref[:, :] = _shear_band_t(
                            wbuf_ref[slot, :, 4 * p:4 * p + 4], W)
                        for R in range(R_BLOCKS):
                            row0 = N - 1 - 128 * R
                            part_ref[:, :] += jax.lax.dot_general(
                                m_ref[row0:row0 + N, :],
                                dec_ref[j * N + 128 * R:
                                        j * N + 128 * (R + 1), :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                    upd = upd + (part_ref[:, :].astype(jnp.uint32)
                                 << np.uint32(BK_LIMB_BITS * li))
                out_ref[o * N:(o + 1) * N, :] += upd
            return carry

        jax.lax.fori_loop(0, n0, iter_body, 0)

    return kernel, dict(N=N, n0=n0, k=k, I=I, G=G, W=W)


@functools.partial(jax.jit, static_argnames=("params", "b_tile"))
def blind_rotate_pallas(acc_init: jnp.ndarray, abar: jnp.ndarray,
                        wext: jnp.ndarray, params: GateParams,
                        b_tile: int = 256) -> jnp.ndarray:
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
    kernel, dims = _make_kernel(params)
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
            pltpu.VMEM((I * N, bt), jnp.int8),       # dec
            pltpu.VMEM((W, 128), jnp.int8),          # Toeplitz band Mt
            pltpu.VMEM((N, bt), jnp.int32),          # partial accumulator
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

def prepare_wext(bk: np.ndarray, params: GateParams) -> np.ndarray:
    """BK [n0, (k+1)l, k+1, N] uint32 -> wext [n0, 2N, 4G] int8 (transposed).

    Column 4p+c holds the negacyclic-extended, limb-decomposed key polynomial
    (index-u entry wneg[u - (N-1)]) pre-rotated down by c — the low 2 bits of
    the in-kernel shear, pre-applied so the kernel can rotate the packed
    int32 view (see _shear_band_t).
    """
    from .limbs import u32_to_signed_limbs

    n0, I, kp1, N = bk.shape
    limbs = u32_to_signed_limbs(bk, nlimbs=BK_NLIMBS, bits=BK_LIMB_BITS)
    assert limbs.min() >= -64 and limbs.max() <= 63
    G = kp1 * BK_NLIMBS * I
    gp = -(-(4 * G) // 128) * 128      # lane-align for DMA
    wext = np.zeros((n0, 2 * N, gp), dtype=np.int8)
    base = np.zeros((n0, 2 * N), dtype=np.int8)
    for o in range(kp1):
        for li in range(BK_NLIMBS):
            for j in range(I):
                p = (o * BK_NLIMBS + li) * I + j
                poly = limbs[:, j, o, :, li]        # [n0, N]
                base[:, :N - 1] = -poly[:, 1:]
                base[:, N - 1:2 * N - 1] = poly
                base[:, 2 * N - 1] = 0
                for c in range(4):
                    wext[:, :, 4 * p + c] = np.roll(base, c, axis=1)
    return wext
