#!/usr/bin/env python3
"""Derive bench_prior.json floors from a clean board (SURVEY §6 policy, r11).

Usage:
  python3 scripts/true_floors.py bench_out.json > bench_prior.json
  python3 scripts/true_floors.py bench_out.json bench_clean_prior.json \
      --check bench_prior.json

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

Regime sentinel (r13, adjudication wired r14): Bench times one
fixed-shape probe at board start/middle/end and ships the triple as
board["sentinel"] (a failed probe ships -1.0, never its time-to-abort).
This script annotates the triple on stderr from whichever samples are
valid, and — in --check mode — ADJUDICATES floor breaches through it:
each query's sample/floor ratio is also read normalized by the
cross-board regime ratio (this board's sentinel mean vs the prior clean
board's); a breach that disappears under normalization is classified
"regime, re-true floors from this board", one that persists is "plan,
investigate the query". Identical code + drifted sentinel = machine
regime; stable sentinel + one drifted query = plan regression. Floors
themselves are still derived from raw board samples.
"""
import json
import sys

BAND = 1.15
MIN_FLOOR = 0.5
BREACH = 2.0
REGIME_SHIFT = 1.3


def sentinel_samples(board: dict) -> list[float]:
    """The valid (positive) sentinel samples; failed probes ship -1.0 and
    never-measured slots 0.0 — both are absent, not data."""
    sent = board.get("sentinel") or {}
    return [sent[k] for k in ("start", "mid", "end")
            if isinstance(sent.get(k), (int, float)) and sent[k] > 0]


def regime_ratio(board: dict, prior_board: dict | None) -> float | None:
    vals = sentinel_samples(board)
    pvals = sentinel_samples(prior_board) if prior_board else []
    if not vals or not pvals:
        return None
    return (sum(vals) / len(vals)) / (sum(pvals) / len(pvals))


def annotate_sentinel(board: dict, prior_board: dict | None) -> None:
    if "sentinel" not in board:
        return
    vals = sentinel_samples(board)
    if not vals:
        print(f"[floors] sentinel incomplete: {board['sentinel']}",
              file=sys.stderr)
        return
    intra = max(vals) / min(vals)
    shown = "/".join(f"{v:.3f}" for v in vals)
    msg = (f"[floors] sentinel samples = {shown} s "
           f"({len(vals)}/3 valid, intra-board drift {intra:.2f}x)")
    ratio = regime_ratio(board, prior_board)
    if ratio is not None:
        msg += f"; regime vs prior board {ratio:.2f}x"
        if ratio >= REGIME_SHIFT or ratio <= 1 / REGIME_SHIFT:
            msg += (" — REGIME SHIFT: re-true floors from this"
                    " board (both directions)")
    print(msg, file=sys.stderr)


def check(board: dict, prior_board: dict | None, floors_path: str) -> None:
    """Breach adjudication (r13 verdict task 6): classify every >=2x floor
    breach as regime vs plan using the sentinel-derived regime ratio, so a
    machine-regime shift needs zero human diagnosis."""
    with open(floors_path) as f:
        floors = json.load(f)
    ratio = regime_ratio(board, prior_board)
    norm = ratio if ratio is not None else 1.0
    queries = board.get("queries", board)
    out = {"regime_ratio": ratio, "breaches": []}
    for q, t in sorted(queries.items()):
        fl = floors.get(q)
        if not fl:
            continue
        raw = t / fl
        adj = raw / norm
        if raw >= BREACH:
            verdict = ("regime, re-true floors from this board"
                       if adj < BREACH else "plan, investigate the query")
            out["breaches"].append({
                "query": q, "sample": t, "floor": fl,
                "ratio": round(raw, 2), "regime_normalized": round(adj, 2),
                "verdict": verdict})
    if ratio is not None and (ratio >= REGIME_SHIFT or ratio <= 1 / REGIME_SHIFT):
        out["regime_shift"] = True
    json.dump(out, sys.stdout, indent=2)
    sys.stdout.write("\n")


def main() -> None:
    args = sys.argv[1:]
    floors_path = None
    if "--check" in args:
        i = args.index("--check")
        floors_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    src = args[0] if args else "bench_out.json"
    with open(src) as f:
        board = json.load(f)
    prior_board = None
    if len(args) > 1:
        try:
            with open(args[1]) as f:
                prior_board = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass
    annotate_sentinel(board, prior_board)
    if floors_path:
        check(board, prior_board, floors_path)
        return
    queries = board["queries"] if "queries" in board else board
    floors = {q: round(max(t * BAND, MIN_FLOOR), 3)
              for q, t in sorted(queries.items())}
    json.dump(floors, sys.stdout, indent=2, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
