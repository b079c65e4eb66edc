"""Regenerate ROTATION.md — the driver-verification ledger.

Reads every CORRECTNESS_r*.json in the repo root plus the current
``__spark_entry__.queries()`` order and rewrites ROTATION.md: one row
per registry query with its last driver round, full driver history,
and whether it sits in the current first-50 window.  Run after each
round's CORRECTNESS file lands and after any registry reorder.

Usage: python scripts/update_rotation.py
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50
GROWTH_CEILING = 40
SLA_ROUNDS = 3


def load_history() -> dict[str, list[tuple[int, bool]]]:
    hist: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        for q, v in data.items():
            green = (
                isinstance(v, dict)
                and v.get("err") is None
                and bool(v.get("rows_match"))
                and bool(v.get("schema_match"))
            )
            hist.setdefault(q, []).append((rnd, green))
    return hist


def last_rounds(
    allq: list[str], hist: dict[str, list[tuple[int, bool]]]
) -> dict[str, int]:
    """Last driver round per query (0 = never checked)."""
    return {q: max((r for r, _ in hist.get(q, [])), default=0) for q in allq}


def staleness_violations(
    allq: list[str],
    hist: dict[str, list[tuple[int, bool]]],
    window: int = WINDOW,
) -> list[str]:
    """The stalest-first draw invariant (round-14 finding: the r14
    window drew 2-round-stale rows while a 5-round-stale cohort sat
    outside).  A checked query OUTSIDE the current window must not be
    staler than the NEWEST checked query inside it by more than one
    round — one round of slack covers the cohort-boundary split (the
    window takes part of a cohort) and deliberate family-first
    promotions (policy rule 1), while any real stalest-first
    inversion trips it.  Never-checked rows are growth, governed by
    policy rule 2, and excluded from both sides.

    Returns human-readable violation lines (empty = invariant holds).
    """
    last = last_rounds(allq, hist)
    inside = [last[q] for q in allq[:window] if last[q] > 0]
    outside = [(q, last[q]) for q in allq[window:] if last[q] > 0]
    if not inside or not outside:
        return []
    newest_inside = max(inside)
    floor = newest_inside - 1
    return [
        f"`{q}` (last driver row r{r}) sits OUTSIDE the window while "
        f"the window holds a query last checked r{newest_inside} — "
        f"staler by more than one round"
        for q, r in outside
        if r < floor
    ]


def draw_preview(
    allq: list[str],
    hist: dict[str, list[tuple[int, bool]]],
    window: int = WINDOW,
) -> list[str]:
    """The stalest-first draw order for the NEXT window: never-checked
    (growth) rows first in registry order, then checked rows by last
    driver round ascending, ledger order within a cohort."""
    last = last_rounds(allq, hist)
    order = {q: i for i, q in enumerate(allq)}
    return sorted(allq, key=lambda q: (last[q] != 0, last[q], order[q]))[
        :window
    ]


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    allq = list(mod.queries().keys())
    hist = load_history()
    cur_round = max((r for rs in hist.values() for r, _ in rs), default=0)

    rows = []
    for i, q in enumerate(allq):
        h = sorted(hist.get(q, []))
        last = (
            f"r{h[-1][0]} ({'green' if h[-1][1] else 'FAIL'})" if h else "never"
        )
        history = ", ".join(
            f"r{r}:{'green' if g else 'FAIL'}" for r, g in h
        ) or "—"
        window = "**window**" if i < WINDOW else ""
        rows.append((q, last, history, window))

    never_total = sum(1 for q, l, _, _ in rows if l == "never")
    never_after = sum(1 for q, l, _, w in rows if l == "never" and not w)

    out = [
        "# ROTATION — driver-verification ledger",
        "",
        "The driver's correctness gate checks the FIRST 50 entries of",
        f"`__spark_entry__.queries()` each round. This ledger tracks, for",
        f"all {len(allq)} registry queries, the last round each had a",
        "driver row, its full driver history, and whether it sits in the",
        f"current window (generated after round {cur_round};",
        "`python scripts/update_rotation.py` regenerates it).",
        "",
        "## Policy",
        "",
        f"1. **Every registry query must get a driver row within"
        f" {SLA_ROUNDS} rounds of being added.** The window is drawn"
        " family-first: any operator family with zero driver history"
        " outranks recency.",
        f"2. **Registry growth pauses while the never-checked count"
        f" OUTSIDE the current window exceeds {GROWTH_CEILING}**"
        " (in-window rows drain when the driver runs, so the ceiling"
        f" is the post-drain backlog). Currently {never_total}"
        f" never-checked in total; {never_after} outside the current"
        " window (i.e., remaining after it drains).",
        "3. Demotion requires >=1 green driver round AND family coverage"
        " staying in-window (a green sibling exercising the same code"
        " path).",
        "4. Local verification (`scripts/check_oracle.py`, strictly"
        " stricter than the driver: full-precision cells, result-type"
        " audit, partitioning-stability double-run) runs on the whole"
        " window before each rotation commit and on rotation candidates"
        " before promotion.",
        "5. **ANSI gate**: the current window also runs under"
        " `scripts/check_oracle.py --ansi`"
        " (`spark.sql.ansi.enabled=true`) before each rotation commit"
        " — ANSI mode turns silent out-of-range `element_at` / cast"
        " corners into loud errors (the round-10 full-registry sweep"
        " caught two latent hazards this way; a round-14"
        " full-registry ANSI sweep re-ran green).",
        "6. **Stalest-first assertion** (added after the round-14 draw"
        " passed over a 5-round-stale cohort): this script FAILS if a"
        " checked query outside the current window is staler than the"
        " newest checked query inside it by more than one round, and"
        " prints the stalest-first draw order for the next window."
        " One round of slack covers cohort-boundary splits and"
        " family-first promotions; real inversions exit nonzero.",
        "",
        "## Demotion list (policy rule 3)",
        "",
        "Family siblings eligible to be passed over when drawing a"
        " window, because a green sibling exercises the same code path"
        " and each has >=2 green driver rounds.  With 240 rows and 50"
        " checked per round, worst-case staleness is ~5 rounds unless"
        " redundant shapes yield their slots; the q-series (22 rows,"
        " one scan→join→aggregate family) is the main surplus.",
        "",
        "- `q4_order_priority`, `q6_forecast_revenue`,"
        " `q12_shipmode_priority`, `q14_promo_share`,"
        " `q17_small_quantity_revenue`, `q19_discounted_revenue` —"
        " single-table or 2-table filter+aggregate shapes; family"
        " anchors `q1_pricing_summary` (scan+aggregate) and"
        " `q3_top_revenue` (join+aggregate) stay in normal rotation.",
        "- `q10_returned_items`, `q13_customer_distribution`,"
        " `q15_top_supplier`, `q16_supplier_counts`,"
        " `q22_global_sales_opportunity` — multi-join aggregates"
        " covered by `q5_region_revenue`, `q8_market_share`,"
        " `q9_product_profit` (deeper join trees, same operators).",
        "- `q18_large_orders`, `q20_excess_suppliers`,"
        " `q21_waiting_supplier` — correlated/semi-join family;"
        " anchor `q2_min_cost_supplier` (scalar subquery +"
        " multi-join) stays.",
        "- Demoted rows still run in the periodic full-registry local"
        " sweeps (strict + ANSI), so demotion trades DRIVER recency,"
        " never correctness coverage; any demoted row that fails a"
        " local sweep re-enters the next window at the front.",
        "",
        "## Ledger",
        "",
        "| # | Query | Last driver row | History | |",
        "|---|---|---|---|---|",
    ]
    for i, (q, last, history, window) in enumerate(rows, 1):
        out.append(f"| {i} | `{q}` | {last} | {history} | {window} |")
    out.append("")

    with open(os.path.join(REPO, "ROTATION.md"), "w") as f:
        f.write("\n".join(out))
    print(
        f"ROTATION.md written: {len(allq)} queries, "
        f"{never_total} never-checked ({never_after} outside window)"
    )

    # next-window preview: simulate the current window draining at
    # cur_round+1, then order what remains stalest-first
    drained = dict(hist)
    for q in allq[:WINDOW]:
        drained[q] = drained.get(q, []) + [(cur_round + 1, True)]
    preview = draw_preview(allq, drained)
    nxt = last_rounds(allq, drained)
    print("\nstalest-first draw order for the NEXT window "
          "(after this window drains):")
    for q in preview:
        print(f"  {q} (last: {'never' if nxt[q] == 0 else f'r{nxt[q]}'})")

    violations = staleness_violations(allq, hist)
    if violations:
        print("\n" + "!" * 72)
        print("STALEST-FIRST VIOLATION — the current window passes over "
              "a staler cohort:")
        for v in violations:
            print(f"  - {v}")
        print("reorder the window list in __spark_entry__.queries() "
              "(see the draw order above) and rerun")
        print("!" * 72)
        sys.exit(2)
    print("\nstalest-first assertion: OK")


if __name__ == "__main__":
    main()
