#!/usr/bin/env python
"""Round-over-round bench comparison: print a per-query delta table
between two bench JSON lines (e.g. BENCH_r01.json vs a fresh
``python bench.py`` run) so regressions are visible at a glance.

Usage: python scripts/bench_delta.py OLD.json NEW.json [--md]

Output: one row per query with old/new seconds and the ratio; queries
present on only one side are listed separately. Exit code 1 when any
query regressed by more than REGRESS_RATIO (and by at least
NOISE_FLOOR seconds — this box is noisy at the sub-second scale).
"""

from __future__ import annotations

import json
import sys

REGRESS_RATIO = 1.5
NOISE_FLOOR = 0.75   # sec; below this, ratios are box noise


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)           # whole-file (pretty-printed) form
        if "queries" in obj:
            return obj
        # driver wrapper: the bench line is embedded in obj["tail"]
        tail = obj.get("tail", "")
        at = tail.rfind('{"metric"')
        if at >= 0:
            return json.JSONDecoder().raw_decode(tail[at:])[0]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():       # bench.py's one-JSON-line form
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no JSON object in {path}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq),
                    key=lambda q: -(nq[q] / max(oq[q], 1e-9)))
    print(f"| query | {args[0]} | {args[1]} | ratio |")
    print("|---|---:|---:|---:|")
    regressed = []
    for q in shared:
        r = nq[q] / max(oq[q], 1e-9)
        flag = ""
        if r > REGRESS_RATIO and nq[q] - oq[q] > NOISE_FLOOR:
            flag = " **regressed**"
            regressed.append(q)
        print(f"| {q} | {oq[q]:.2f} | {nq[q]:.2f} | {r:.2f}x{flag} |")
    tot_o = sum(oq[q] for q in shared)
    tot_n = sum(nq[q] for q in shared)
    print(f"| **total (shared)** | {tot_o:.2f} | {tot_n:.2f} | "
          f"{tot_n / max(tot_o, 1e-9):.2f}x |")
    for side, only in (("old", set(oq) - set(nq)), ("new", set(nq) - set(oq))):
        if only:
            print(f"\n{side}-only: " + ", ".join(
                f"{q} ({(oq if side == 'old' else nq)[q]:.2f}s)"
                for q in sorted(only)))
    if regressed:
        print(f"\nREGRESSED (> {REGRESS_RATIO}x and > {NOISE_FLOOR}s): "
              + ", ".join(regressed), file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
