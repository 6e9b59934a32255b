"""Quasi-Monte-Carlo (Sobol) uniforms for the direct sampler.

The closed-form direct engine (``trace_direct.py``) consumes exactly SEVEN
uniforms per ray — a fixed, low dimension, which is the textbook setting
where a low-discrepancy sequence beats i.i.d. sampling: smooth functionals
of the chain (exit fraction, mean bounce count) converge at ~N^-1 instead
of N^-1/2, and indicator functionals (flux-map cells) at ~N^-3/4.  The
reference has no analogue — its ROBAST chain consumes an unbounded random
stream per ray, which cannot be QMC'd without path-space reordering.

Implementation: 32-bit Sobol points with Joe-Kuo "new-joe-kuo-6"
direction numbers (the same public table scipy.stats.qmc.Sobol ships;
first 16 dimensions hardcoded below and pinned bit-exact against scipy in
``tests/test_qmc.py``), generated ON DEVICE from the point index — no
host generation or transfer.  Randomisation is a per-dimension digital
shift (XOR with a random 32-bit word drawn from the session key): each
shifted replicate is marginally Uniform[0,1)^d and unbiased, so repeated
seeds give honest error bars while each replicate keeps the
low-discrepancy structure.

Opt-in via ``TraceConfig(qmc=1)``: rays within one ``trace_rays_direct``
batch become stratified rather than independent (the POINT of QMC), so
downstream per-cell variances shrink — anything that assumed i.i.d. rays
(e.g. binomial-sem tolerances) becomes conservative, never wrong in the
mean.  The deferred-rim continuation's closed-form finish draws from the
same Sobol block under a fresh shift (marginals exactly uniform and
independent of the lane states, so the law is unchanged; the full
low-discrepancy benefit applies only to the pristine main phase —
continuation lanes arrive compacted with correlated states); the
continuation's 16 in-loop prefix iterations stay pseudorandom.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Joe-Kuo new-joe-kuo-6 parameters, dims 2..16 (dim 1 is the van der
# Corput sequence in base 2).  poly = primitive polynomial bitmask
# (leading + constant bits included), vinit = initial direction integers
# m_1..m_s.  Verified bit-exact against scipy.stats.qmc.Sobol.
_POLY = [3, 7, 11, 13, 19, 25, 37, 41, 47, 55, 59, 61, 67, 91, 97]
_VINIT = [
    [1],
    [1, 3],
    [1, 3, 1],
    [1, 1, 1],
    [1, 1, 3, 3],
    [1, 3, 5, 13],
    [1, 1, 5, 5, 17],
    [1, 1, 5, 5, 5],
    [1, 1, 7, 11, 19],
    [1, 1, 5, 1, 1],
    [1, 1, 1, 3, 11],
    [1, 3, 5, 5, 31],
    [1, 3, 3, 9, 7, 49],
    [1, 1, 1, 15, 21, 21],
    [1, 3, 1, 13, 27, 49],
]
MAX_DIM = 1 + len(_POLY)
_BITS = 32


def _direction_matrix(dim: int) -> np.ndarray:
    """``[dim, 32]`` uint32 direction numbers v_k (host-side, tiny)."""
    if not 1 <= dim <= MAX_DIM:
        raise ValueError(f"sobol dims 1..{MAX_DIM}, got {dim}")
    V = np.zeros((dim, _BITS), np.uint32)
    # dim 1: van der Corput — v_k = 1 << (32 - k)
    for k in range(_BITS):
        V[0, k] = np.uint32(1) << np.uint32(_BITS - 1 - k)
    for d in range(1, dim):
        poly = _POLY[d - 1]
        m = list(_VINIT[d - 1])
        s = len(m)
        # inner coefficients a_1..a_{s-1}: bits of poly between the
        # leading and constant terms, high to low
        a = [(poly >> (s - i)) & 1 for i in range(1, s)]
        v = [np.uint32(m[k]) << np.uint32(_BITS - 1 - k) for k in range(s)]
        for k in range(s, _BITS):
            new = v[k - s] ^ (v[k - s] >> np.uint32(s))
            for i in range(1, s):
                if a[i - 1]:
                    new ^= v[k - i]
            v.append(new)
        V[d] = v
    return V


def sobol_bits(n: int, dim: int) -> jax.Array:
    """``[dim, n]`` uint32 Sobol integers for point indices 0..n-1,
    computed on device (bit-test + XOR-reduce over the 32 direction
    numbers; ~64 int ops per value, negligible next to any kernel)."""
    V = jnp.asarray(_direction_matrix(dim))          # [dim, 32]
    i = jnp.arange(n, dtype=jnp.uint32)
    idx = i ^ (i >> jnp.uint32(1))                   # Gray-code order,
    # matching the standard recursive implementations (scipy included)

    def body(k, acc):
        bit = (idx >> k) & jnp.uint32(1)             # [n]
        return acc ^ (jnp.where(bit == 1, V[:, k, None],
                                jnp.uint32(0)))      # [dim, n]

    # indices < n use only the low ceil(log2(n)) bits — no point XORing
    # direction numbers for bits that are always zero
    n_bits = max(1, int(n - 1).bit_length()) if n > 1 else 1
    return jax.lax.fori_loop(
        0, min(_BITS, n_bits), body, jnp.zeros((dim, n), jnp.uint32))


def _reverse_bits32(x: jax.Array) -> jax.Array:
    """Bit-reverse each uint32 (the classic 5-step swap network)."""
    u = jnp.uint32
    x = ((x & u(0x55555555)) << u(1)) | ((x >> u(1)) & u(0x55555555))
    x = ((x & u(0x33333333)) << u(2)) | ((x >> u(2)) & u(0x33333333))
    x = ((x & u(0x0F0F0F0F)) << u(4)) | ((x >> u(4)) & u(0x0F0F0F0F))
    x = ((x & u(0x00FF00FF)) << u(8)) | ((x >> u(8)) & u(0x00FF00FF))
    return (x << u(16)) | (x >> u(16))


def _laine_karras(x: jax.Array, seed: jax.Array) -> jax.Array:
    """Laine-Karras hash permutation (Burley, JCGT 2020 "Practical
    Hash-based Owen Scrambling"): in bit-reversed space, every operation
    only propagates information toward higher bits, so in original space
    each output bit depends on the more-significant input bits — a valid
    nested (Owen) permutation selected by ``seed``."""
    u = jnp.uint32
    x = x + seed
    x = x ^ (x * u(0x6C50B47C))
    x = x ^ (x * u(0xB82F1E52))
    x = x ^ (x * u(0xC7AFE638))
    x = x ^ (x * u(0x8D22F6E6))
    return x


def sobol_uniforms(key: jax.Array, n: int, dim: int,
                   dtype=jnp.float32, mode: str = "shift") -> jax.Array:
    """``[dim, n]`` randomised Sobol uniforms in [0, 1).

    ``key`` selects the per-dimension randomisation — a fresh unbiased
    replicate per key (pass the same per-batch key the pseudorandom path
    would use).  ``mode``:

    * ``"shift"`` — random digital shift (XOR a 32-bit word per dim):
      cheapest, keeps plain Sobol's box-counting discrepancy.
    * ``"owen"`` — hash-based Owen scrambling (Laine-Karras permutation
      per dim, independent seeds): breaks Sobol's diagonal alignment
      artifacts and improves convergence on discontinuous observables
      (flux-map cells); ~2x the generation cost of shift.

    Conversion keeps the top 24 bits so every value is exactly
    representable in f32.
    """
    x = sobol_bits(n, dim)
    if mode == "shift":
        x = x ^ jax.random.bits(key, (dim, 1), jnp.uint32)
    elif mode == "owen":
        seeds = jax.random.bits(key, (dim, 1), jnp.uint32)
        x = _reverse_bits32(_laine_karras(_reverse_bits32(x), seeds))
    else:
        raise ValueError(f"qmc mode {mode!r} (want 'shift' or 'owen')")
    return ((x >> jnp.uint32(8)).astype(dtype)
            * dtype(1.0 / (1 << 24)))
