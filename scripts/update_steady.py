"""Regenerate bench_steady.json — the per-query steady-state bests that
bench.py's straggler pass compares against.

The table used to be a hand-maintained dict inside bench.py; that
drifts two ways: a new headline query silently misses straggler
protection, and an optimized query false-positives against a stale
constant.  This script derives it instead, merging by per-query MIN
(a steady-state best can only improve; a contended run can never
lower a min, so all rounds are safe to include):

  - every ``BENCH_r*.json`` in the repo root — driver runs at sf0.1;
    the bench one-liner is embedded in the driver wrapper's ``tail``
  - every entry already in ``bench_steady.json`` (so isolation
    re-timings and solo-run bests are never lost)
  - any extra bench-output JSON files passed on argv (solo runs:
    ``python bench.py > /tmp/solo.json`` then pass that path)

Only sf=0.1 runs count: steady state is defined at the headline scale
factor.  bench.py scales the comparison by the session's own median
best/steady ratio, so the table stays usable on slower hardware and
at other SFs without edits here.

Because entries are monotone minima, a DELIBERATE plan change that
makes a query genuinely slower would leave an unreachable stale
minimum that flags the query as a straggler forever.  ``--rebase``
resets that: it discards the existing table (and, with
``--since-round N``, any BENCH history before round N) and rebuilds
from the remaining runs; ``--drop q1,q2`` instead surgically removes
only the named queries before the normal merge, letting included
history repopulate them.

Usage:
  python scripts/update_steady.py [extra_bench_output.json ...]
  python scripts/update_steady.py --rebase [--since-round N] [extra ...]
  python scripts/update_steady.py --drop q1,q2 [extra ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_steady.json")


def _bench_lines(path: str):
    """Yield bench one-liner dicts found in a file — either a raw
    bench.py output line or a driver wrapper with the line in tail."""
    text = open(path).read()
    try:
        d = json.loads(text)
    except ValueError:
        d = None
    if isinstance(d, dict) and d.get("metric") == "headline_total":
        yield d
        return
    # driver wrapper: the one-liner sits somewhere inside "tail"
    hay = d.get("tail", "") if isinstance(d, dict) else text
    for m in re.finditer(r'\{"metric": "headline_total".*?\}(?=\s|$)', hay):
        try:
            yield json.loads(m.group(0))
        except ValueError:
            continue


def _bench_round(path: str) -> int | None:
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    return int(m.group(1)) if m else None


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Regenerate bench_steady.json from bench history")
    ap.add_argument("extra", nargs="*",
                    help="extra bench-output JSON files (solo runs)")
    ap.add_argument("--rebase", action="store_true",
                    help="discard the existing table and rebuild from "
                         "history only (resets stale minima after a "
                         "deliberate plan regression)")
    ap.add_argument("--since-round", type=int, default=None, metavar="N",
                    help="with --rebase: only use BENCH_r*.json from "
                         "round N onward (extra files always count)")
    ap.add_argument("--drop", default=None, metavar="Q1,Q2",
                    help="remove the named queries from the existing "
                         "table before merging, so included history "
                         "repopulates them")
    args = ap.parse_args()
    if args.since_round is not None and not args.rebase:
        ap.error("--since-round requires --rebase")

    # two-lane table: sf0.1 (driver testdata) and sf1 (the
    # scripts/scaling_probe set); a legacy flat table reads as sf0.1
    lanes: dict[str, dict[str, float]] = {"sf0.1": {}, "sf1": {}}
    if not args.rebase and os.path.exists(OUT):
        existing = json.load(open(OUT))
        if existing and all(isinstance(v, dict) for v in existing.values()):
            for lane, table in existing.items():
                lanes.setdefault(lane, {}).update(table)
        else:
            lanes["sf0.1"].update(existing)
    if args.drop:
        for q in args.drop.split(","):
            for table in lanes.values():
                table.pop(q.strip(), None)

    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    paths += sorted(glob.glob(os.path.join(REPO, "BENCH_sf1*.json")))
    if args.rebase and args.since_round is not None:
        paths = [p for p in paths
                 if _bench_round(p) is None
                 or _bench_round(p) >= args.since_round]
    paths += args.extra
    used = {"sf0.1": 0, "sf1": 0}
    for path in paths:
        for line in _bench_lines(path):
            sf = line.get("sf")
            lane = {0.1: "sf0.1", 1: "sf1"}.get(sf)
            if lane is None:
                continue
            used[lane] += 1
            table = lanes[lane]
            for q, best in line.get("queries", {}).items():
                if not isinstance(best, (int, float)) or best <= 0:
                    continue
                if q not in table or best < table[q]:
                    table[q] = round(float(best), 3)

    with open(OUT, "w") as f:
        json.dump(
            {lane: dict(sorted(t.items())) for lane, t in sorted(lanes.items())},
            f, indent=1, sort_keys=True,
        )
        f.write("\n")
    print(f"bench_steady.json written: "
          f"{len(lanes['sf0.1'])} sf0.1 queries from {used['sf0.1']} runs, "
          f"{len(lanes['sf1'])} sf1 queries from {used['sf1']} runs")

    # loud coverage check: headline queries without an entry fall back
    # to the weaker spread-only straggler heuristic
    sys.path.insert(0, REPO)
    import bench

    for lane in ("sf0.1", "sf1"):
        missing = [q for q in ["gen_10m_rows", *bench.HEADLINE]
                   if q not in lanes[lane]]
        if missing:
            print(f"WARNING: {lane} lane missing steady entries: "
                  f"{missing} — run bench.py solo at that SF and pass "
                  f"its output here")


if __name__ == "__main__":
    main()
