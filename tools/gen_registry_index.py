"""Regenerate COVERAGE.md's auto-maintained registry index section.

Rewrites everything after the '## Registry index' header (appending the
section if absent) with the current QUERIES registry grouped by module.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = "## Registry index (all registered query names, by module)"


def main() -> None:
    from crypto_price_data_pipeline_spark.queries import QUERIES

    bymod: dict[str, list[str]] = {}
    for n, fn in QUERIES.items():
        bymod.setdefault(fn.__module__.split(".")[-1], []).append(n)
    lines = [
        HEADER,
        "",
        "Auto-maintained appendix so every registry name is greppable here;",
        "regenerate with `python tools/gen_registry_index.py`. Every name has",
        "a DuckDB oracle in `oracle_sql()` (0 rows-only entries).",
        "",
    ]
    for mod in sorted(bymod):
        names = " ".join(f"`{n}`" for n in bymod[mod])
        lines.append(f"- **{mod}** ({len(bymod[mod])}): {names}")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    text = open(path).read()
    head = text.split(HEADER)[0].rstrip() + "\n\n"
    open(path, "w").write(head + "\n".join(lines) + "\n")
    print(f"wrote {sum(map(len, bymod.values()))} names across {len(bymod)} modules")


if __name__ == "__main__":
    main()
