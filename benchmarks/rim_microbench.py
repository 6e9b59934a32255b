#!/usr/bin/env python
"""Variant shootout for the deferred-rim index machinery.

``roofline_r5_rim.json`` attributes the flagship's exact-rim cost at 16M
rays: sampler 78 ms, then **nonzero +64 ms, compact gather +49 ms, merge
scatter +40 ms** around 10 ms of actual rim physics.  This harness
measures drop-in variants of each stage in isolation (same shapes, same
~2.2% clip density) so the production pipeline only adopts measured
wins:

* nonzero — current two-level grouped rank+scatter vs a GATHER-CENTRIC
  level 2 (per-group bitmask + offset scatter-add + cumsum + bit-select;
  the only scatters left are level-1's 2M-update index build and a
  512K-update offset mark, vs 2M + 4M updates today) vs a fully
  scatter-free binary-search variant (searchsorted over group-popcount
  offsets, 'scan' and 'sort' lowerings);
* compact gather — packed ``[n, k]`` row gather (current; the minor dim
  k pads to the 128-lane tile) vs per-field gathers vs a ``[k, n]``
  transposed pack;
* merge — k full-width scatters (current) vs one packed ``[k, n]``
  column scatter vs an inverse-index scatter + k gathers + selects.

``--check`` asserts every variant bit-exact against the current
implementation (run on CPU; cheap shapes).  Timing runs want the real
chip: ``python benchmarks/rim_microbench.py --json out.json``.

VERDICT (measured 2026-08-19, v5e, 16M lanes / 2.2% density / k=10 —
``rim_micro_r5.json`` + ``rim_micro_r5_gm.json``): the shipped pipeline
wins every stage.  nonzero: grouped 87 ms vs gathered 120 / flat 143 /
searchsorted 261 / searchsorted-sort 107.  gather: packrows 84 ms vs
packT 85 / per-field 284.  merge: k scatters 119 ms vs packT 153 /
inverse-gather 4,164.  No variant adopted; harness retained for
re-measurement on future TPU generations.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import atomic_json_dump  # noqa: E402


def _readback(x):
    import jax
    import jax.numpy as jnp
    jax.block_until_ready(x)
    return float(jnp.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(f, *args, repeats=3):
    _readback(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _readback(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# candidate nonzero variants (NOT adopted — every one measured slower than
# compact.nonzero_indices_grouped on v5e, see rim_micro_r5.json; kept here
# so the shootout is re-runnable, out of the production module)
# ---------------------------------------------------------------------------

def nonzero_indices_searchsorted(mask, size: int, fill: int, group: int = 8,
                                 method: str = "scan"):
    """Scatter-free ``nonzero_indices`` via binary search — identical
    contract (exact: first ``size`` masked-lane indices ascending, padded
    with ``fill``; never drops below ``size``).

    Lanes are grouped by ``group``; the exclusive cumsum of group
    popcounts maps each output slot ``j`` to its owning group with
    ``searchsorted(off, j, 'right') - 1`` (empty-group ties repeat the
    owner's offset and PRECEDE it, so 'right' lands on the owner), and
    the lane within the group is the ``(j - off[g])``-th set bit of the
    group's bitmask, recovered by a fixed ``group``-step popcount select.
    Measured v5e, 16M lanes / 2.2% density: 261 ms ('scan') / 107 ms
    ('sort') vs 87 ms for the shipped grouped rank+scatter — NON-WIN.
    """
    import jax.numpy as jnp

    mask = mask.astype(bool)
    n = mask.shape[0]
    if n < 4096:
        return jnp.nonzero(mask, size=size, fill_value=fill)[0]
    pad = (-n) % group
    mp = (jnp.concatenate([mask, jnp.zeros((pad,), bool)]) if pad else mask)
    m2 = mp.reshape(-1, group)                              # [ng, group]
    ng = m2.shape[0]
    pow2 = (1 << jnp.arange(group, dtype=jnp.int32))
    bits = (m2.astype(jnp.int32) * pow2).sum(axis=1)        # [ng]
    cnt = m2.astype(jnp.int32).sum(axis=1)                  # popcount
    off = jnp.cumsum(cnt) - cnt                             # exclusive
    total = off[-1] + cnt[-1]
    slot = jnp.arange(size, dtype=jnp.int32)
    g = jnp.searchsorted(off, slot, side="right",
                         method=method).astype(jnp.int32) - 1
    g = jnp.clip(g, 0, ng - 1)
    r = slot - off[g]                                       # rank in group
    bg = bits[g]
    pc = jnp.zeros((size,), jnp.int32)
    lane = jnp.zeros((size,), jnp.int32)
    for k in range(group):
        bit = (bg >> k) & 1
        lane = jnp.where((bit == 1) & (pc == r), k, lane)
        pc = pc + bit
    idx = g * group + lane
    return jnp.where(slot < total, idx, fill).astype(jnp.int32)



def nonzero_indices_gathered(mask, size: int, fill: int,
                             group_capacity: int, group: int = 8):
    """Same contract as ``compact.nonzero_indices_grouped`` — first
    ``size`` masked-lane indices ascending, ``(idx, n_dropped)`` — but
    level 2 is scatter-free: each selected group's lane indices are
    *computed* per output slot (owning group via a cumsum over scattered
    slot-start marks, rank via the slot's offset into the group, lane via
    a popcount bit-select over the group's 8-bit mask) instead of rank-
    scattering all ``group_capacity * group`` candidate lanes.
    """
    import jax.numpy as jnp
    from altair_tpu.core.compact import nonzero_indices

    mask = mask.astype(bool)
    n = mask.shape[0]
    pad = (-n) % group
    mp = (jnp.concatenate([mask, jnp.zeros((pad,), bool)]) if pad else mask)
    m2 = mp.reshape(-1, group)                              # [ng, group]
    ng = m2.shape[0]
    gc = min(group_capacity, ng)
    pow2 = (1 << jnp.arange(group, dtype=jnp.int32))
    bits_all = (m2.astype(jnp.int32) * pow2).sum(axis=1)    # [ng]
    gidx = nonzero_indices(bits_all > 0, gc, ng)            # ascending
    gvalid = gidx < ng
    gsafe = jnp.minimum(gidx, ng - 1)
    b = jnp.where(gvalid, bits_all[gsafe], 0)               # [gc]
    cnt = jnp.zeros_like(b)
    for k in range(group):
        cnt = cnt + ((b >> k) & 1)
    go = jnp.cumsum(cnt) - cnt                              # exclusive
    total = go[-1] + cnt[-1]
    # Owning group per output slot: selected groups are ascending with
    # every valid one non-empty (its flag guarantees >= 1 lane), so a +1
    # mark at each group's first slot and a cumsum recover the group's
    # position in the gc arrays.  Invalid tail groups add nothing.
    starts = jnp.zeros((size,), jnp.int32).at[go].add(
        (cnt > 0).astype(jnp.int32), mode="drop")
    j = jnp.clip(jnp.cumsum(starts) - 1, 0, gc - 1)         # [size]
    slot = jnp.arange(size, dtype=jnp.int32)
    r = slot - go[j]                                        # rank in group
    bj = b[j]
    pc = jnp.zeros((size,), jnp.int32)
    lane = jnp.zeros((size,), jnp.int32)
    for k in range(group):
        bit = (bj >> k) & 1
        lane = jnp.where((bit == 1) & (pc == r), k, lane)
        pc = pc + bit
    idx = gsafe[j] * group + lane
    idx = jnp.where(slot < total, idx, fill).astype(jnp.int32)
    n_dropped = mask.sum(dtype=jnp.int32) - total
    return idx, n_dropped


# ---------------------------------------------------------------------------
# stage variants
# ---------------------------------------------------------------------------

def make_inputs(key, n, m, density, k_fields):
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(key, 2 + k_fields)
    mask = jax.random.uniform(ks[0], (n,)) < density
    fields = [jax.random.normal(ks[2 + i], (n,), jnp.float32)
              for i in range(k_fields)]
    compact_vals = [jax.random.normal(ks[1], (m,), jnp.float32) + i
                    for i in range(k_fields)]
    return mask, fields, compact_vals


def variants(n, m, gc, k_fields):
    import jax.numpy as jnp
    from altair_tpu.core.compact import (nonzero_indices,
                                         nonzero_indices_grouped)

    def nz_flat(mask):
        return nonzero_indices(mask, m, n), jnp.zeros((), jnp.int32)

    def nz_grouped(mask):
        return nonzero_indices_grouped(mask, m, n, gc)

    def nz_gathered(mask):
        return nonzero_indices_gathered(mask, m, n, gc)

    def nz_searchsorted(mask):
        return (nonzero_indices_searchsorted(mask, m, n),
                jnp.zeros((), jnp.int32))

    def nz_searchsorted_sort(mask):
        return (nonzero_indices_searchsorted(mask, m, n, method="sort"),
                jnp.zeros((), jnp.int32))

    def gather_packrows(idx, fields):        # current _compact_gather body
        safe = jnp.minimum(idx, n - 1)
        rows = jnp.stack(fields, 1)[safe]
        return [rows[:, i] for i in range(len(fields))]

    def gather_per_field(idx, fields):
        safe = jnp.minimum(idx, n - 1)
        return [f[safe] for f in fields]

    def gather_packT(idx, fields):
        safe = jnp.minimum(idx, n - 1)
        packed = jnp.stack(fields, 0)        # [k, n] — minor dim unpadded
        rows = packed[:, safe]               # [k, m]
        return [rows[i] for i in range(len(fields))]

    def merge_scatters(sidx, fields, compact_vals):   # current
        return [f.at[sidx].set(c, mode="drop")
                for f, c in zip(fields, compact_vals)]

    def merge_packT(sidx, fields, compact_vals):
        X = jnp.stack(fields, 0)                      # [k, n]
        X = X.at[:, sidx].set(jnp.stack(compact_vals, 0), mode="drop")
        return [X[i] for i in range(len(fields))]

    def merge_inv_gather(sidx, fields, compact_vals):
        inv = jnp.full((n,), -1, jnp.int32).at[sidx].set(
            jnp.arange(m, dtype=jnp.int32), mode="drop")
        wrote = inv >= 0
        safe = jnp.maximum(inv, 0)
        return [jnp.where(wrote, c[safe], f)
                for f, c in zip(fields, compact_vals)]

    return {
        "nz": {"flat": nz_flat, "grouped": nz_grouped,
               "gathered": nz_gathered, "searchsorted": nz_searchsorted,
               "searchsorted_sort": nz_searchsorted_sort},
        "gather": {"packrows": gather_packrows,
                   "per_field": gather_per_field, "packT": gather_packT},
        "merge": {"scatters": merge_scatters, "packT": merge_packT,
                  "inv_gather": merge_inv_gather},
    }


def check(n=50_000, m=None, gc=None, k_fields=4, density=0.022):
    """Bit-exactness of every variant vs the current implementation."""
    import jax
    import jax.numpy as jnp
    m = m or max(256, n >> 4)
    gc = gc or max(256, m >> 1)
    V = variants(n, m, gc, k_fields)
    for seed, dens in ((0, density), (1, 0.0), (2, 0.5), (3, density)):
        mask, fields, cvals = make_inputs(jax.random.key(seed), n, m,
                                          dens, k_fields)
        ref_idx, ref_drop = V["nz"]["grouped"](mask)
        ref_flat = V["nz"]["flat"](mask)[0]
        for name, f in V["nz"].items():
            idx, drop = f(mask)
            if name == "flat" or name.startswith("searchsorted"):
                # flat-contract variants never drop; also bit-exact vs
                # grouped whenever grouped didn't drop
                assert (idx == ref_flat).all(), (name, seed)
                assert int(ref_drop) or (idx == ref_idx).all(), name
            else:
                assert (idx == ref_idx).all(), (name, seed)
                assert int(drop) == int(ref_drop), (name, seed)
        ref_g = V["gather"]["packrows"](ref_idx, fields)
        for name, f in V["gather"].items():
            out = f(ref_idx, fields)
            for a, b in zip(ref_g, out):
                assert (a == b).all(), (name, seed)
        valid = ref_idx < n
        sidx = jnp.where(valid, ref_idx, n)
        ref_m = V["merge"]["scatters"](sidx, fields, cvals)
        for name, f in V["merge"].items():
            out = f(sidx, fields, cvals)
            for a, b in zip(ref_m, out):
                assert (a == b).all(), (name, seed)
    print("all variants bit-exact")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--n", type=int, default=16 * (1 << 20))
    ap.add_argument("--density", type=float, default=0.022,
                    help="clip density (production: ~2.2% of rays)")
    ap.add_argument("--m-shift", type=int, default=4,
                    help="output capacity = n >> m_shift (rim: 4; wave "
                         "compaction's dense regime: 2)")
    ap.add_argument("--k-fields", type=int, default=10,
                    help="packed field count (rim gather: 10; merge: 11)")
    ap.add_argument("--check", action="store_true",
                    help="bit-exactness only (small shapes; run on CPU)")
    ap.add_argument("--stages", nargs="+",
                    default=["nz", "gather", "merge"])
    args = ap.parse_args()

    if args.check:
        # force the CPU backend the conftest way: this environment's
        # sitecustomize rewrites JAX_PLATFORMS at boot, so the env var
        # alone would still init the (possibly busy) tunnel device
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        check(n=50_000, k_fields=args.k_fields)
        return

    import jax
    import jax.numpy as jnp

    n = args.n
    m = max(256, n >> args.m_shift)
    gc = max(256, m >> 1)
    dev = jax.devices()[0]
    rows = {"device": dev.device_kind, "n": n, "m": m,
            "density": args.density, "k_fields": args.k_fields}

    def log(k, v):
        rows[k] = v
        print(f"[{k}] {v}")
        if args.json:
            atomic_json_dump(args.json, rows)

    V = variants(n, m, gc, args.k_fields)
    mask, fields, cvals = make_inputs(jax.random.key(0), n, m,
                                      args.density, args.k_fields)
    idx, _ = jax.jit(V["nz"]["grouped"])(mask)
    sidx = jnp.where(idx < n, idx, n)

    # fields/cvals MUST be explicit jit args: closed-over device arrays
    # become jaxpr constants baked into the HLO, and 640 MB of literals
    # stalls compilation for tens of minutes through the tunnel
    if "nz" in args.stages:
        for name, f in V["nz"].items():
            g = jax.jit(lambda mk, f=f: f(mk)[0].sum())
            log(f"nz_{name}_s", round(timeit(g, mask), 4))
    if "gather" in args.stages:
        for name, f in V["gather"].items():
            g = jax.jit(lambda ix, fl, f=f: sum(o.sum() for o in f(ix, fl)))
            log(f"gather_{name}_s", round(timeit(g, idx, fields), 4))
    if "merge" in args.stages:
        for name, f in V["merge"].items():
            g = jax.jit(lambda sx, fl, cv, f=f:
                        sum(o.sum() for o in f(sx, fl, cv)))
            log(f"merge_{name}_s", round(timeit(g, sidx, fields, cvals), 4))
    if args.json:
        atomic_json_dump(args.json, rows)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
