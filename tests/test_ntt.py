"""NTT layer (RAINTT small-modulus instantiation) — mirrors the reference's
test_polynomial_mult_1024: forward -> pointwise -> inverse vs a naive O(n^2)
CPU negacyclic convolution (reference test_polynomial_mult_1024.cu:49-250),
plus discretization-switching error bounds (ntt_small_modulus.cuh:40-73).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cufhe_tpu.ops import ntt


def naive_negacyclic_mod(a, b, p):
    """O(n^2) negacyclic convolution mod p (the reference's CPU oracle)."""
    n = len(a)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                out[k] = (out[k] + int(a[i]) * int(b[j])) % p
            else:
                out[k - n] = (out[k - n] - int(a[i]) * int(b[j])) % p
    return out.astype(np.uint32)


@pytest.mark.parametrize("nbit", [4, 10])
def test_ntt_roundtrip(nbit, rng):
    N = 1 << nbit
    tab = ntt.make_tables(nbit)
    a = jnp.asarray(rng.integers(0, ntt.P, (3, N)).astype(np.uint32))
    back = np.asarray(ntt.ntt_inverse(ntt.ntt_forward(a, tab), tab))
    assert np.array_equal(back, np.asarray(a))


def test_ntt_polynomial_mult_vs_naive(rng):
    """Exact mod-p product for bounded inputs (n*max_a*max_b < p — the
    reference's bound derivation, test_polynomial_mult_1024.cu:33-39)."""
    nbit, N = 10, 1024
    tab = ntt.make_tables(nbit)
    # 1024 * 2^9 * 2^9 < p ~ 2^29.3
    for _ in range(3):
        a = rng.integers(0, 1 << 9, N).astype(np.uint32)
        b = rng.integers(0, 1 << 9, N).astype(np.uint32)
        b_ntt = np.asarray(ntt.ntt_forward(jnp.asarray(b)[None], tab))[0]
        got = np.asarray(ntt.negacyclic_mul_mod_p(
            jnp.asarray(a)[None], jnp.asarray(b_ntt)[None],
            jnp.asarray(ntt.shoup_precompute(b_ntt))[None], tab))[0]
        want = naive_negacyclic_mod(a, b, ntt.P)
        assert np.array_equal(got, want)


def test_mulhi_and_shoup_exactness(rng):
    a = rng.integers(0, 1 << 32, 1000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, 1000, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(ntt._mulhi_u32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(
        np.uint32)
    assert np.array_equal(got, want)
    w = rng.integers(0, ntt.P, 1000).astype(np.uint32)
    x = rng.integers(0, ntt.P, 1000).astype(np.uint32)
    ws = ntt.shoup_precompute(w)
    got = np.asarray(ntt.mulmod_shoup(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(ws)))
    want = ((x.astype(np.uint64) * w.astype(np.uint64)) % ntt.P).astype(
        np.uint32)
    assert np.array_equal(got, want)


def test_torus_discretization_switching(rng):
    """Torus -> mod-p -> torus roundtrip error <= ceil(2^32/(2p))
    (the RAINTT discretization, ntt_small_modulus.cuh:40-73)."""
    a = rng.integers(0, 1 << 32, 4096, dtype=np.uint64).astype(np.uint32)
    m = np.asarray(ntt.torus_to_mod(jnp.asarray(a)))
    want = np.asarray(
        ((a.astype(np.uint64) * ntt.P + (1 << 31)) >> 32) % ntt.P,
        dtype=np.uint32)
    assert np.array_equal(m, want)
    back = ntt.mod_to_torus(m)
    diff = np.minimum(back - a, a - back)  # wrap-aware |difference|
    assert diff.max() <= (1 << 32) // (2 * ntt.P) + 1


def test_torus_polymul_via_small_modulus(rng):
    """Torus poly x small integer poly through the small-modulus pipeline:
    error vs exact mod-2^32 convolution bounded by N * max|b| * switch-step
    (the documented accuracy tradeoff of the reference's
    USE_SMALL_NTT_MODULUS mode)."""
    from cufhe_tpu.golden import negacyclic_polymul
    nbit, N = 10, 1024
    tab = ntt.make_tables(nbit)
    a = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(-32, 32, N).astype(np.int64)
    b_p = (b % ntt.P).astype(np.uint32)
    b_ntt = np.asarray(ntt.ntt_forward(jnp.asarray(b_p)[None], tab))[0]
    a_m = ntt.torus_to_mod(jnp.asarray(a)[None])
    prod = np.asarray(ntt.ntt_inverse(ntt.pointwise_mul(
        ntt.ntt_forward(a_m, tab), jnp.asarray(b_ntt)[None],
        jnp.asarray(ntt.shoup_precompute(b_ntt))[None]), tab))[0]
    got = ntt.mod_to_torus(prod)
    want = negacyclic_polymul(a, b.astype(np.uint32))
    diff = np.minimum(got - want, want - got).astype(np.int64)
    bound = N * 32 * ((1 << 32) // ntt.P + 1)
    assert diff.max() <= bound
