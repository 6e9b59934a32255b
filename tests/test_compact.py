"""Blocked-cumsum compaction primitives vs jnp.nonzero — bit-exact
(core/compact.py; the deferred-rim pipeline's hot index build)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from altair_tpu.core.compact import nonzero_indices, nonzero_indices_grouped


@pytest.mark.parametrize("n,frac", [
    (100, 0.5),          # small-n fallback path
    (4096, 0.02),        # exactly block-aligned
    (5000, 0.3),         # padded tail
    (1 << 17, 0.02),     # blocked path, sparse
    (1 << 17, 0.9),      # dense
])
@pytest.mark.parametrize("size_mode", ["under", "exact", "over"])
def test_matches_jnp_nonzero(n, frac, size_mode):
    mask = np.asarray(
        jax.random.uniform(jax.random.key(n + int(frac * 100)), (n,)) < frac)
    k = int(mask.sum())
    size = {"under": max(1, k // 2), "exact": max(1, k),
            "over": k + 37}[size_mode]
    ref = jnp.nonzero(jnp.asarray(mask), size=size, fill_value=n)[0]
    got = jax.jit(lambda m: nonzero_indices(m, size, n))(jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_all_false_and_all_true():
    n = 1 << 14
    for mask in (jnp.zeros((n,), bool), jnp.ones((n,), bool)):
        ref = jnp.nonzero(mask, size=100, fill_value=n)[0]
        got = nonzero_indices(mask, 100, n)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("n,frac", [
    (1 << 17, 0.02),      # the rim-clip regime the grouped path targets
    (1 << 17, 0.001),     # very sparse
    (5000, 0.05),         # padded tail (n % group != 0 after grouping)
    (4099, 0.3),          # odd n
])
@pytest.mark.parametrize("size_mode", ["under", "exact", "over"])
def test_grouped_matches_flat(n, frac, size_mode):
    mask = np.asarray(
        jax.random.uniform(jax.random.key(n * 7 + int(frac * 1e4)), (n,))
        < frac)
    k = int(mask.sum())
    size = {"under": max(1, k // 2), "exact": max(1, k),
            "over": k + 37}[size_mode]
    ref = jnp.nonzero(jnp.asarray(mask), size=size, fill_value=n)[0]
    # group capacity comfortably above the group count -> zero drops
    got, dropped = jax.jit(lambda m: nonzero_indices_grouped(
        m, size, n, group_capacity=max(64, 2 * k)))(jnp.asarray(mask))
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grouped_counts_dropped_on_group_overflow():
    """More occupied groups than group_capacity: the overflow is counted
    (callers raise on it), and the produced indices are still the first
    masked lanes in ascending order."""
    n = 1 << 16
    mask = np.zeros(n, bool)
    mask[::8] = True                      # every group occupied: 8192 groups
    gc = 1000
    got, dropped = nonzero_indices_grouped(jnp.asarray(mask), 2000, n,
                                           group_capacity=gc)
    assert int(dropped) == 8192 - gc
    got = np.asarray(got)
    np.testing.assert_array_equal(got[:gc], np.arange(gc) * 8)
    assert (got[gc:] == n).all()          # fill beyond the surviving lanes


def test_grouped_integer_mask_normalized():
    n = 1 << 16
    m_int = np.zeros(n, np.int32)
    m_int[5] = 3                          # >1 values must not corrupt ranks
    m_int[1000] = 1
    got, dropped = nonzero_indices_grouped(jnp.asarray(m_int), 4, n, 64)
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(got), [5, 1000, n, n])
