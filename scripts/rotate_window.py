"""Compute the next round's driver correctness window.

The driver hashes the FIRST 50 registry entries each round
(queries/__init__ pins the current round's prefix as an explicit name
tuple). This script derives the NEXT rotation: every oracle-backed
query with no driver-green row in any CORRECTNESS_r*.json, topped up
to 50 with the least-recently-verified green queries.

Usage: python scripts/rotate_window.py
Prints a ready-to-paste `_WINDOW_R{next} = (...)` tuple. It does NOT
edit the registry — rotation must be a deliberate start-of-round edit
(the prefix has to stay byte-stable within a round).
"""
from __future__ import annotations

import glob
import json
import re
import sys


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    green_round: dict[str, int] = {}  # name -> last driver-green round
    rounds = []
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        rounds.append(rnd)
        d = json.load(open(path))
        rows = d if isinstance(d, dict) else {}
        for name, v in rows.items():
            if isinstance(v, dict) and v.get("hash_match"):
                green_round[name] = max(green_round.get(name, 0), rnd)

    oracles = set(entry.oracle_sql())
    registry = list(entry.queries())
    never = [n for n in registry if n in oracles and n not in green_round]
    refill = sorted((n for n in registry
                     if n in oracles and n in green_round),
                    key=lambda n: (green_round[n], registry.index(n)))
    window = (never + refill)[:50]
    nxt = (max(rounds) + 1) if rounds else 1
    print(f"# {len(never)} never-green oracle queries; "
          f"{max(0, 50 - len(never))} refill slots "
          f"(least-recently-verified first)")
    print(f"_WINDOW_R{nxt} = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
