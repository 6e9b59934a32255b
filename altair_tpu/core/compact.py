"""Stream-compaction primitives tuned for TPU.

``jnp.nonzero(mask, size=m)`` dominates the deferred-rim pipeline at
large N (~180 ms of a ~330 ms 16M-ray trace on v5e — XLA lowers it
through a full-width cumsum plus a slow index build).  The replacement
here computes the same first-``size`` indices with a BLOCKED prefix sum
(vector-friendly: cumsum along the 1024-lane minor axis of an
``[n/1024, 1024]`` reshape plus a tiny cumsum over block totals) and one
int32 scatter whose indices are strictly increasing (each masked lane's
exclusive global prefix count) — measured 110 ms vs 182 ms at 16M lanes,
bit-identical output (``tests/test_compact.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

_BLOCK = 1024


def nonzero_indices(mask, size: int, fill: int):
    """First ``size`` indices where ``mask`` is True, ascending, padded
    with ``fill`` — exactly ``jnp.nonzero(mask, size=size,
    fill_value=fill)[0]``, via blocked-cumsum + ordered scatter."""
    mask = mask.astype(bool)   # integer masks > 1 would corrupt the ranks
    n = mask.shape[0]
    if n < 4 * _BLOCK:
        return jnp.nonzero(mask, size=size, fill_value=fill)[0]
    pad = (-n) % _BLOCK
    mp = (jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
          if pad else mask)
    cb = mp.astype(jnp.int32).reshape(-1, _BLOCK)
    intra = jnp.cumsum(cb, axis=1)              # inclusive, per block
    tot = intra[:, -1]
    off = jnp.cumsum(tot) - tot                 # exclusive block offsets
    pos = (intra - cb + off[:, None]).reshape(-1)
    if pad:
        pos = pos[:n]
    # beyond-capacity lanes and unmasked lanes land out of bounds -> drop.
    # No unique/sorted scatter hints: the index vector interleaves the
    # ascending masked-lane positions with the duplicate out-of-bounds
    # `size` for every unmasked lane, so those hints would be UB (and
    # measured no speedup on v5e anyway).
    pos = jnp.where(mask, pos, size)
    return jnp.full((size,), fill, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
