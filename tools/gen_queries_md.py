"""Regenerate QUERIES.md from the live query registry.

The index drifted twice (round-5 and round-6 additions landed without
a refresh) because the regeneration snippet lived only in old commit
messages; it is a checked-in tool now. Usage:

    python tools/gen_queries_md.py            # rewrites QUERIES.md
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

MAX_SUMMARY = 160

HEADER = """# QUERIES — the oracle-checked catalog (auto-generated index)

Every entry is registered in `__spark_entry__.queries()` with a DuckDB
`oracle_sql()` twin and verified hash-exact at sf0.01 by
`tools/check_correctness.py`. Regenerate with
`python tools/gen_queries_md.py`.

**{n} queries, {n_oracle} with oracles**{remainder_note}

| query | one-line summary |
|---|---|
"""


def summary_of(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    text = re.sub(r"\s+", " ", doc)
    if len(text) > MAX_SUMMARY:
        text = text[: MAX_SUMMARY - 3].rstrip() + "..."
    return text.replace("|", "\\|")


def main() -> int:
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    note = (
        ""
        if len(oracles) == len(qs)
        else " (the remainder are rows-only: genuinely iterative/non-SQL ops)"
    )
    lines = [
        HEADER.format(n=len(qs), n_oracle=len(oracles), remainder_note=note)
    ]
    for name in sorted(qs):
        lines.append(f"| {name} | {summary_of(qs[name])} |\n")
    rows_only = sorted(set(qs) - set(oracles))
    lines.append(
        "\nRows-only (no oracle by design): " + ", ".join(rows_only) + "\n"
        if rows_only
        else "\nEvery registered query has a DuckDB oracle.\n"
    )
    with open("QUERIES.md", "w") as f:
        f.writelines(lines)
    print(f"QUERIES.md: {len(qs)} queries, {len(oracles)} oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
