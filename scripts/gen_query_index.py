"""Generate QUERIES.md: an auto-generated index of every registry
entry — name, oracle status, tags, and the first docstring line —
so the full surface is navigable without reading each module.

Regenerate with `python scripts/gen_query_index.py` after adding
queries.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdbms_scala_spark.registry import all_queries  # noqa: E402


def main() -> None:
    specs = all_queries()
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    lines = [
        "# QUERIES — registry index (generated)",
        "",
        f"{len(specs)} registered queries, {n_oracle} with DuckDB oracles"
        + ("." if n_oracle == len(specs) else ""),
    ]
    if n_oracle < len(specs):
        lines += [
            "(rest are rows-only: hash-seed-, sketch- or stub-dependent, each",
            "covered by a recall/equivalence test).",
        ]
    lines += [
        "Regenerate with `python scripts/gen_query_index.py`.",
        "",
        "| query | oracle | tags | what it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        doc = (s.fn.__doc__ or "").strip().split("\n")[0].rstrip(".")
        tags = " ".join(s.tags)
        lines.append(f"| `{name}` | {'✓' if s.oracle else 'rows-only'} | {tags} | {doc} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md ({len(specs)} entries)")


if __name__ == "__main__":
    main()
