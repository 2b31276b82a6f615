#!/usr/bin/env python3
"""Derive bench_prior.json floors from a clean board (SURVEY §6 policy, r11).

Usage: python3 scripts/true_floors.py bench_out.json > bench_prior.json

Policy (written into SURVEY §6 "Round-11 floor policy"):

    floor(q) = max(clean_board_sample(q) * BAND, MIN_FLOOR)

- BAND = 1.15: the documented machine-day regime half-band (§6 noise
  model: identical-code boards span ±10-15%). Truing floors to the
  FASTEST clean board (the r10 practice) guarantees that any
  slower-regime board reads one-signed >=1.15x across the whole key set
  and pushes the tiny-query tail over the 2x gate — r10's only gate
  breach. Floors must represent the ceiling of normal, not the best
  observation.
- MIN_FLOOR = 0.5 s: the fixed-overhead quantum. A sub-half-second
  query's board sample is dominated by scheduler/JIT jitter (~0.2-0.3 s
  on a 32-thread board); a ratio gate against a 0.22 s floor measures
  the jitter, not the plan (r10: kanon_audit 2.16x, expl1 2.12x,
  smp2 2.03x — all sub-0.5 s absolute). Under the clamp a tiny query
  only breaches 2x when it actually costs >=1.0 s, which on a ~0.3 s
  steady state is a real 3x+ regression — exactly the signal the gate
  exists for.

Regression sensitivity is preserved: a genuine plan regression must now
exceed 2 * 1.15 = 2.3x of the clean-board sample to breach, versus 2.0x
before — while the Prof steady-state audit (every round's floor audit)
remains the fine-grained detector for sub-gate drift.

Regime sentinel (r13): Bench times one fixed-shape probe at board
start/middle/end and ships the triple as board["sentinel"]. This script
annotates it on stderr — intra-board drift (max/min of the triple) and,
when a prior board is given as argv[2] (e.g. the committed
bench_clean.json), the cross-board regime ratio (mean vs mean). Reading:
identical code + drifted sentinel = machine regime (re-true floors, both
directions); stable sentinel + one drifted query = plan regression
(investigate the query). The annotation is informational — floors are
still derived from the board samples alone.
"""
import json
import sys

BAND = 1.15
MIN_FLOOR = 0.5


def annotate_sentinel(board: dict, prior_path: str | None) -> None:
    sent = board.get("sentinel")
    if not sent:
        return
    vals = [sent.get(k, 0.0) for k in ("start", "mid", "end")]
    if min(vals) <= 0:
        print(f"[floors] sentinel incomplete: {sent}", file=sys.stderr)
        return
    intra = max(vals) / min(vals)
    msg = (f"[floors] sentinel start/mid/end = "
           f"{vals[0]:.3f}/{vals[1]:.3f}/{vals[2]:.3f} s "
           f"(intra-board drift {intra:.2f}x)")
    if prior_path:
        try:
            with open(prior_path) as f:
                prev = json.load(f).get("sentinel")
            if prev:
                pvals = [prev.get(k, 0.0) for k in ("start", "mid", "end")]
                if min(pvals) > 0:
                    ratio = (sum(vals) / 3) / (sum(pvals) / 3)
                    msg += f"; regime vs prior board {ratio:.2f}x"
                    if ratio >= 1.3 or ratio <= 1 / 1.3:
                        msg += (" — REGIME SHIFT: re-true floors from this"
                                " board (both directions)")
        except (OSError, json.JSONDecodeError):
            pass
    print(msg, file=sys.stderr)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    with open(src) as f:
        board = json.load(f)
    annotate_sentinel(board, sys.argv[2] if len(sys.argv) > 2 else None)
    queries = board["queries"] if "queries" in board else board
    floors = {q: round(max(t * BAND, MIN_FLOOR), 3)
              for q, t in sorted(queries.items())}
    json.dump(floors, sys.stdout, indent=2, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
