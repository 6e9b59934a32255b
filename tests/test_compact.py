"""Blocked-cumsum compaction primitive vs jnp.nonzero — bit-exact
(core/compact.py; the deferred-rim pipeline's hot index build)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from altair_tpu.core.compact import nonzero_indices


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
