"""Compile a Spark ``Column`` filter into pyarrow/petastorm-style DNF
tuples, so ``filters=<Column>`` readers can stream row groups directly
from the source filesystem instead of materializing a filtered copy to
driver-local disk (round-2 verdict: reader.py tempfile path).

Walks the ``ColumnNode`` tree a classic pyspark 4.x Column wraps
(org.apache.spark.sql.internal.UnresolvedFunction / UnresolvedAttribute
/ Literal). Only comparison leaves over a single column with a
primitive literal are accepted; anything else (arithmetic, string
functions, UDFs, struct fields, non-primitive literals such as
timestamps) returns None and the caller falls back to the residual
JVM-filter path.

The conversion distributes AND over OR into full disjunctive normal
form — worst-case exponential in expression depth, so the clause count
is capped (a filter that explodes past the cap is left JVM-side).

Null semantics are identical on both tiers: a comparison with NULL is
NULL (row dropped), ``!(x = v)`` / ``!(x in ...)`` drop NULL rows both
in Spark and in the DNF mask evaluation (_piece_worker._cond_mask).
"""

from __future__ import annotations

_COMPARE_OPS = {">": ">", ">=": ">=", "<": "<", "<=": "<=", "=": "="}
_NEGATED = {"=": "!=", "in": "not in"}
_MAX_CLAUSES = 64


class _NotCompilable(Exception):
    pass


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _attr_name(node) -> str:
    if _cls(node) != "UnresolvedAttribute":
        raise _NotCompilable
    parts = node.nameParts()
    if parts.size() != 1:
        raise _NotCompilable  # struct fields / qualified names stay JVM-side
    return parts.apply(0)


def _lit_value(node):
    if _cls(node) != "Literal":
        raise _NotCompilable
    v = node.value()
    # py4j auto-converts primitive java values; timestamps/decimals/etc.
    # surface as JavaObject wrappers -> not compilable
    if v is None or not isinstance(v, (bool, int, float, str)):
        raise _NotCompilable
    return v


def _args(node) -> list:
    seq = node.arguments()
    return [seq.apply(i) for i in range(seq.size())]


def _leaf(node) -> tuple:
    """A single comparison -> ('col', op, value) DNF condition."""
    if _cls(node) != "UnresolvedFunction":
        raise _NotCompilable
    fn = node.functionName()
    args = _args(node)
    if fn == "!":
        if len(args) != 1 or _cls(args[0]) != "UnresolvedFunction":
            raise _NotCompilable
        inner = args[0]
        neg = _NEGATED.get(inner.functionName())
        if neg is None:
            raise _NotCompilable
        iargs = _args(inner)
        if neg == "not in":
            return (_attr_name(iargs[0]), neg, [_lit_value(a) for a in iargs[1:]])
        return (_attr_name(iargs[0]), neg, _lit_value(iargs[1]))
    if fn == "in":
        return (_attr_name(args[0]), "in", [_lit_value(a) for a in args[1:]])
    op = _COMPARE_OPS.get(fn)
    if op is None or len(args) != 2:
        raise _NotCompilable
    # attr on either side; flip the comparison when the literal leads
    if _cls(args[0]) == "UnresolvedAttribute":
        return (_attr_name(args[0]), op, _lit_value(args[1]))
    flipped = {">": "<", ">=": "<=", "<": ">", "<=": ">=", "=": "="}[op]
    return (_attr_name(args[1]), flipped, _lit_value(args[0]))


def _dnf(node) -> list[list[tuple]]:
    """Disjunction-of-conjunctions clause list for a boolean node."""
    if _cls(node) == "UnresolvedFunction":
        fn = node.functionName()
        if fn == "or":
            left, right = _args(node)
            clauses = _dnf(left) + _dnf(right)
            if len(clauses) > _MAX_CLAUSES:
                raise _NotCompilable
            return clauses
        if fn == "and":
            left, right = _args(node)
            out = [lc + rc for lc in _dnf(left) for rc in _dnf(right)]
            if len(out) > _MAX_CLAUSES:
                raise _NotCompilable
            return out
    return [[_leaf(node)]]


def column_to_dnf(col) -> list[list[tuple]] | None:
    """DNF tuple clauses equivalent to a Column filter, or None when the
    expression is not expressible (caller keeps the JVM filter)."""
    try:
        node = col._jc.node()
    except AttributeError:
        return None  # Spark Connect column or non-classic session
    try:
        return _dnf(node)
    except _NotCompilable:
        return None
    except Exception:  # py4j surprises on exotic nodes: never fail the reader
        return None
