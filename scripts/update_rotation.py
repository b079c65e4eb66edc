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


if __name__ == "__main__":
    main()
