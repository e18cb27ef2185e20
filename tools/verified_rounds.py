"""Driver-verification freshness ledger. Reads every CORRECTNESS_r*.json
the driver has stamped and writes VERIFIED.json:

    {"rounds_seen": [2,3,...],
     "queries": {name: {"last_round": N, "rounds": [..], "last_green": bool}},
     "never_verified": [...],
     "stalest": [[name, last_round], ...]}

This is the input to the re-verification policy stated in
music_database_spark/registry.py: once the never-verified pool is empty,
each round's DRIVER_PRIORITY window takes (a) that round's new
additions, then (b) the stalest `last_round` names — freshness debt,
oldest round first. Run after every driver stamp:

    python tools/verified_rounds.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def collect(max_round: int | None = None) -> dict:
    """Build the freshness ledger from the driver's CORRECTNESS stamps.

    max_round, when given, ignores rounds after it — this is how the
    rotation test reconstructs the exact state a DRIVER_PRIORITY window
    was designed against (registry.WINDOW_DESIGNED_AFTER_ROUND), so the
    test stays green after the driver stamps the current round's file."""
    from music_database_spark.registry import load_all

    reg = load_all()
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        if max_round is not None and int(m.group(1)) > max_round:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    queries: dict[str, dict] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            if name not in queries:
                queries[name] = {"rounds": [], "last_round": None, "last_green": None}
            q = queries[name]
            q["rounds"].append(rnd)
            q["last_round"] = rnd
            # rows-only rows have hash_match None/absent; green means the
            # strongest check the row carries passed.
            q["last_green"] = bool(
                row.get("err") is None
                and row.get("rows_match", True) is not False
                and row.get("schema_match", True) is not False
                and row.get("hash_match", True) is not False
            )
    never = sorted(n for n in reg if n not in queries)
    stale = sorted(
        ((n, q["last_round"]) for n, q in queries.items() if n in reg),
        key=lambda t: (t[1], t[0]),
    )
    return {
        "rounds_seen": sorted(rounds),
        "queries": queries,
        "never_verified": never,
        "stalest": stale[:60],
        "registered": len(reg),
        "verified": sum(1 for n in reg if n in queries),
    }


def propose_window(data: dict, size: int = 50) -> list[str]:
    """The next round's DRIVER_PRIORITY under the registry policy:
    never-verified names first (oracle-backed before rows-only — the
    registry's own remainder ordering already guarantees new additions
    sit at the top of the never-verified pool), then the stalest
    last_round names, oldest round first."""
    from music_database_spark.registry import load_all

    reg = load_all()
    never = [n for n in reg if n in data["never_verified"]]
    never.sort(key=lambda n: reg[n].oracle is None)  # stable: registry order
    stale = [n for n, _ in data["stalest"] if n not in never]
    return (never + stale)[:size]


def main() -> int:
    data = collect()
    if "--propose-window" in sys.argv:
        for name in propose_window(data):
            print(f'    "{name}",')
        return 0
    out = os.path.join(REPO, "VERIFIED.json")
    with open(out, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(
        f"{data['verified']}/{data['registered']} registered queries have a "
        f"driver CORRECTNESS row (rounds {data['rounds_seen']}); "
        f"{len(data['never_verified'])} never verified"
    )
    not_green = [n for n, q in data["queries"].items() if not q["last_green"]]
    if not_green:
        print(f"not green on last check: {sorted(not_green)}")
    print("stalest 10:", data["stalest"][:10])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
