"""Generate QUERIES.md: one line per registered query, grouped by
module, with oracle status — the auditable inventory of the Layer-B
surface. Run from the repo root: python tools/gen_query_inventory.py"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_events_to_clickhouse_tables_spark.registry import load_all


def main() -> None:
    reg = load_all()
    by_mod: dict[str, list] = defaultdict(list)
    for name, spec in reg.items():
        mod = spec.build.__module__.rsplit(".", 1)[-1]
        first = (spec.doc or "").strip().splitlines()
        head = first[0].rstrip(".") if first else ""
        by_mod[mod].append((name, spec.oracle is not None, head))
    n_oracle = sum(1 for s in reg.values() if s.oracle is not None)
    lines = [
        "# Query inventory",
        "",
        f"{len(reg)} registered queries: {n_oracle} value-checked against a",
        f"DuckDB oracle (row count + schema + value hash), {len(reg) - n_oracle}",
        "rows-only by design (each carries a pytest invariant in",
        "`tests/test_rows_only_invariants.py`). Regenerate with",
        "`python tools/gen_query_inventory.py`.",
        "",
    ]
    for mod in sorted(by_mod):
        lines.append(f"## operators/{mod}.py")
        lines.append("")
        lines.append("| query | oracle | what |")
        lines.append("|---|---|---|")
        for name, has_oracle, head in sorted(by_mod[mod]):
            mark = "value-hash" if has_oracle else "rows-only"
            lines.append(f"| `{name}` | {mark} | {head} |")
        lines.append("")
    with open("QUERIES.md", "w") as fh:
        fh.write("\n".join(lines))
    print(f"QUERIES.md: {len(reg)} queries, {n_oracle} oracle-backed")


if __name__ == "__main__":
    main()
