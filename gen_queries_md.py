"""Generate QUERIES.md — the user-facing catalog of every registered
query — from the registry's own metadata. Run from the repo root:

    python gen_queries_md.py

A sync test (tests/test_registry_contract.py) regenerates the content
and compares, so the checked-in catalog can never drift from the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def render() -> str:
    from stock_data_pipeline_spark import registry

    full = registry.full_queries()
    oracles = set(registry.full_oracles())
    driver = set(registry.all_queries())
    lines = [
        "# QUERIES — the registered query surface",
        "",
        "Auto-generated from the registry (`python gen_queries_md.py`); a",
        "sync test keeps it current. Columns: **oracle** = DuckDB",
        "differential check at sf0.01 and sf0.1; **window** = inside the",
        "verification driver's 50-row CORRECTNESS window this round.",
        "",
        f"{len(full)} queries, {len(oracles)} oracle-backed, "
        f"{len(driver)} in the driver window.",
        "",
        "| query | oracle | window | what it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(full):
        entry = registry.get(name)
        doc = (entry.doc or "").strip().split("\n")[0].strip()
        lines.append(
            f"| `{name}` "
            f"| {'✓' if name in oracles else '—'} "
            f"| {'✓' if name in driver else '—'} "
            f"| {doc} |"
        )
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "QUERIES.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")
