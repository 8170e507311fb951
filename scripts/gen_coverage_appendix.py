"""Regenerate COVERAGE.md's auto-generated appendix in place.

Replaces everything from the '## Appendix:' heading to EOF with the
current registry state — per-module entry lists with o/r marks and
the header counts — so the appendix can never drift from the code.

THE APPENDIX MUST STAY THE LAST SECTION: anything added after it is
deleted by the next regeneration (this silently ate two round-8
sections once — append new COVERAGE sections BEFORE the appendix).
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    # the registry's own module list — a module added there shows up
    # here automatically (no second hardcoded list to drift)
    from threat_detection_nosql_spark.queries import _modules

    lines = []
    total = oracle = 0
    for mod in _modules():
        name = mod.__name__.rsplit(".", 1)[-1]
        qs = {**mod.QUERIES, **getattr(mod, "QUERIES_TAIL", {})}
        os_ = {**mod.ORACLES, **getattr(mod, "ORACLES_TAIL", {})}
        marks = [f"{q} ({'o' if q in os_ else 'r'})" for q in sorted(qs)]
        total += len(qs)
        oracle += sum(q in os_ for q in qs)
        lines.append(f"- **{name}** ({len(qs)}): " + ", ".join(marks))
    appendix = (
        "## Appendix: full query registry (auto-generated)\n\n"
        "`o` = DuckDB-oracle hash-checked, `r` = rows-only "
        "(non-SQL-expressible: engine RNG / model state / stream "
        f"state / sequential greedy). {total} queries, {oracle} "
        "oracle-backed. Regenerate with "
        "`python scripts/gen_coverage_appendix.py`.\n\n"
        + "\n".join(lines) + "\n")
    doc = open("COVERAGE.md").read()
    doc = re.sub(r"## Appendix: full query registry.*\Z", appendix,
                 doc, flags=re.S)
    open("COVERAGE.md", "w").write(doc)
    print(f"appendix regenerated: {total} queries, {oracle} oracle-backed")


if __name__ == "__main__":
    main()
