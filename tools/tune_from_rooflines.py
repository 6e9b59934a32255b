#!/usr/bin/env python
"""Turn roofline_kernels.py JSONs into tuning recommendations.

Reads the round's measurement artifacts and prints, with the numbers that
justify them, the recommended values for:

* ``trace_pallas._REFILL_BUDGET`` / ``_REFILL_HANDOFF`` — from the slot-
  rate-vs-budget sweep and the handoff fraction x budget sweep;
* ``trace.RIM_CONT_FIRST_WAVE`` / ``RIM_CONT_SHRINK`` — from the
  simulate-split schedule sweep (checked for exit-fraction drift, i.e.
  silent ray loss from an undersized early compaction);
* the banded-scorer go/no-go — from the band-feasibility pass costs,
  grouped-nonzero cost and flagged-row occupancy (the scheme wins only if
  saved matmul passes exceed compaction overhead; see RESULTS.md
  "Scoring precision").

Usage: python tools/tune_from_rooflines.py benchmarks/roofline_r4.json \
           [benchmarks/roofline_r4_sim.json] [benchmarks/roofline_r4_band.json]
"""

import json
import re
import sys


def load(paths):
    """Merge the JSONs (last wins) but take ``n_rays`` for the drift check
    from the file that actually CONTAINS the simulate-split rows — the
    sweep may have run with a different --n than the other artifacts
    (ADVICE r4)."""
    out = {}
    sim_n = None
    for p in paths:
        with open(p) as fh:
            d = json.load(fh)
        if any(k.startswith("simulate_") for k in d):
            sim_n = d.get("n_rays", sim_n)
        out.update(d)
    if sim_n is not None:
        out["n_rays"] = sim_n
    return out


def main(paths):
    d = load(paths)
    n = d.get("n_rays", 16 * (1 << 20))

    # ---- refill budget / handoff ------------------------------------------
    slot = {int(m.group(1)): v for k, v in d.items()
            if (m := re.match(r"slot_bounces_per_s_budget(\d+)$", k))}
    if slot:
        best_b = max(slot, key=slot.get)
        print(f"slot rate by budget: {slot}")
        print(f"  -> best raw budget {best_b} "
              f"({slot[best_b] / slot.get(4, slot[best_b]):.3f}x vs shipped 4)")
    hand = {}
    for k, v in d.items():
        m = re.match(r"refill_handoff_b(\d+)_f([\d.]+)_rays_per_s$", k)
        if m:
            hand[(int(m.group(1)), float(m.group(2)))] = v
    if hand:
        base = d.get("refill_prod_rays_per_s")
        best = max(hand, key=hand.get)
        print(f"handoff sweep (rays/s): "
              f"{ {f'b{b} f{f}': v for (b, f), v in sorted(hand.items())} }")
        print(f"  no-handoff production: {base}")
        if base and hand[best] > 1.02 * base:
            print(f"  -> SET _REFILL_BUDGET={best[0]}, "
                  f"_REFILL_HANDOFF={best[1]}  "
                  f"(+{100 * (hand[best] / base - 1):.1f}% vs no handoff)")
        else:
            print("  -> keep _REFILL_HANDOFF=0.0 (no >2% win measured); "
                  "record the table in RESULTS.md")

    # ---- rim continuation schedule ----------------------------------------
    for scene in ("lamb", "brdf"):
        simple = d.get(f"simulate_{scene}_simple_rays_per_s")
        if simple is None:
            continue
        rows = {}
        for k, v in d.items():
            m = re.match(
                rf"simulate_{scene}_rim_fw(\w+)_sh(\d+)_rays_per_s$", k)
            if m:
                fw = None if m.group(1) == "None" else int(m.group(1))
                rows[(fw, int(m.group(2)))] = v
        if not rows:
            continue
        def frac(kk):
            tag = (f"simulate_{scene}_rim_fw"
                   f"{'None' if kk[0] is None else kk[0]}_sh{kk[1]}")
            # prefer the exact exit count (unrounded fraction); fall back
            # to the rounded exit_frac for pre-r5 artifacts (ADVICE r4)
            nx = d.get(f"{tag}_n_exit")
            return nx / n if nx is not None else d.get(f"{tag}_exit_frac")

        fr = {kk: frac(kk) for kk in rows}
        print(f"simulate[{scene}]: simple {simple} rays/s; exact-rim:")
        ref_frac = fr.get((None, 4))
        if ref_frac is None:
            print("  (no reference row (None, 4) in the sweep — "
                  "drift check skipped)")
        for kk in sorted(rows, key=rows.get, reverse=True):
            if ref_frac is None:
                verdict = "no reference row"
            elif fr[kk] is None:
                verdict = "no exit data for this row"
            else:
                drift = abs(fr[kk] - ref_frac)
                ok = drift < 4 * (0.425 * 0.575 / n) ** 0.5
                verdict = "OK" if ok else "DRIFT — check ray loss"
            print(f"  fw={kk[0]} shrink={kk[1]}: {rows[kk]} rays/s "
                  f"exit_frac={fr[kk]} {verdict}")
        base = rows.get((None, 4))
        best = max(rows, key=rows.get)
        if base and rows[best] > 1.02 * base and best != (None, 4):
            print(f"  -> SET RIM_CONT_FIRST_WAVE={best[0]}, "
                  f"RIM_CONT_SHRINK={best[1]} "
                  f"(+{100 * (rows[best] / base - 1):.1f}%) if exit_frac OK")
        else:
            print("  -> keep (None, 4); record the sweep")

    # ---- banded scorer ------------------------------------------------------
    if "band_s_highest_chunk_s" in d:
        hi = d["band_s_highest_chunk_s"]
        high = d["band_s_high_chunk_s"]
        env = d["band_env_chunk_s"]
        nz = d["band_grouped_nonzero_s"]
        occs = [v for k, v in d.items() if "tau0.0002" in k]
        occ = max(occs) if occs else 1.0
        cap_frac = min(1.0, 2 * occ)     # 2x capacity slack over worst chunk
        n_chunks = 16200 // 256
        banded = n_chunks * (high + env + nz + cap_frac * hi)
        mxu = n_chunks * hi
        print(f"banded scorer per-sweep estimate (s-matmul part only): "
              f"banded {banded:.3f}s vs all-HIGHEST {mxu:.3f}s "
              f"(occ@tau2e-4 worst {occ:.3f}, nonzero {nz * 1e3:.2f} ms/chunk)")
        print(f"  -> {'BUILD IT' if banded < 0.9 * mxu else 'measured non-win: record in RESULTS.md'}")


if __name__ == "__main__":
    main(sys.argv[1:])
