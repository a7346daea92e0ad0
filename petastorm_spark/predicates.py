"""Row-predicate surface (parity with petastorm/predicates.py).

Reference semantics (cited for parity, not copied):
  - ``in_set``                 petastorm/predicates.py:44-55
  - ``in_intersection``        petastorm/predicates.py:58-71
  - ``in_lambda``              petastorm/predicates.py:74-100
  - ``in_negate``              petastorm/predicates.py:103-116
  - ``in_reduce``              petastorm/predicates.py:119-141
  - ``in_pseudorandom_split``  petastorm/predicates.py:144-183

Design: every predicate compiles to a Spark ``Column`` when its
semantics are expressible with built-in functions (the fast, JVM-side,
pushdown-friendly path). Only ``in_lambda`` needs Python; it runs as an
Arrow-batched pandas UDF, never row-at-a-time. ``df.filter(pred.to_column())``
keeps Catalyst free to push the filter into the parquet scan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from functools import reduce as _reduce

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# 16^15 — a 15-hex-digit md5 prefix parsed as an integer is uniform on
# [0, HASH_SPACE); dividing maps it to [0, 1). 60 bits fits a signed
# 64-bit integer in both Spark and DuckDB, so oracles can reproduce it.
HASH_SPACE = float(16**15)


def md5_fraction(col) -> Column:
    """Deterministic uniform [0,1) value per input (key-stable: the same
    value always lands in the same place — the property train/val/test
    splits need, which rand()/randomSplit() does not give)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")
        / F.lit(HASH_SPACE)
    ).cast("double")


def _spark_cast_string(v) -> str:
    """Render a python/numpy value the way Spark's CAST(x AS STRING)
    does, so the pandas evaluation path of a hash-keyed predicate lands
    rows in the same subset as the Column path: booleans lowercase
    ('true'/'false', not Python's 'True'), timestamps as
    'yyyy-MM-dd HH:mm:ss[.ffffff]' with the trailing zeros of the
    fractional part trimmed."""
    import datetime

    import numpy as np

    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, np.datetime64):
        v = pd.Timestamp(v).to_pydatetime()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        return s
    return str(v)


class PredicateBase:
    """A predicate over named fields, compilable to a Spark Column."""

    def get_fields(self) -> set[str]:
        raise NotImplementedError

    def to_column(self) -> Column:
        """Spark Column expression; raises if only a Python path exists."""
        raise NotImplementedError

    def do_include_pandas(self, df: pd.DataFrame) -> pd.Series:
        """Vectorized pandas evaluation (for in_lambda and tests)."""
        raise NotImplementedError

    # -- composition sugar ---------------------------------------------------
    def __and__(self, other: "PredicateBase") -> "PredicateBase":
        return in_reduce([self, other], "and")

    def __or__(self, other: "PredicateBase") -> "PredicateBase":
        return in_reduce([self, other], "or")

    def __invert__(self) -> "PredicateBase":
        return in_negate(self)


class in_set(PredicateBase):
    """True iff ``field``'s value is a member of ``values``."""

    def __init__(self, values: Iterable, field: str):
        self._values = list(values)
        self._field = field

    def get_fields(self) -> set[str]:
        return {self._field}

    def to_column(self) -> Column:
        return F.col(self._field).isin(self._values)

    def do_include_pandas(self, df: pd.DataFrame) -> pd.Series:
        return df[self._field].isin(self._values)


class in_intersection(PredicateBase):
    """True iff the array-typed ``field`` shares any element with ``values``."""

    def __init__(self, values: Iterable, field: str):
        self._values = list(values)
        self._field = field

    def get_fields(self) -> set[str]:
        return {self._field}

    def to_column(self) -> Column:
        return F.arrays_overlap(
            F.col(self._field), F.array(*[F.lit(v) for v in self._values])
        )

    def do_include_pandas(self, df: pd.DataFrame) -> pd.Series:
        vals = set(self._values)
        return df[self._field].map(lambda xs: bool(vals.intersection(xs)))


class in_lambda(PredicateBase):
    """Arbitrary user function over the selected fields.

    ``func(field_dict_of_numpy_arrays [, state]) -> bool array`` — the
    vectorized analogue of the reference's row-wise callback. Runs as an
    Arrow-batched pandas UDF via :func:`filter_dataframe`.
    """

    def __init__(self, fields: list[str], func: Callable, state=None):
        self._fields = list(fields)
        self._func = func
        self._state = state

    def get_fields(self) -> set[str]:
        return set(self._fields)

    def to_column(self) -> Column:
        raise TypeError(
            "in_lambda has no Column form; use filter_dataframe(df, pred)"
        )

    def do_include_pandas(self, df: pd.DataFrame) -> pd.Series:
        cols = {f: df[f] for f in self._fields}
        if self._state is not None:
            out = self._func(cols, self._state)
        else:
            out = self._func(cols)
        # a scalar here is almost always a mis-signatured lambda (the
        # func receives a DICT of columns — e.g. ``lambda d: d['x'] > 0``,
        # not ``lambda x: x > 0``, whose dict comparison yields one
        # python bool); silently broadcasting it would turn the
        # predicate into keep-all/drop-all
        if not hasattr(out, "__len__") or len(out) != len(df):
            raise TypeError(
                "in_lambda func must return a boolean array of the batch "
                f"length ({len(df)}), got {type(out).__name__}; note the "
                "func receives a dict of column arrays"
            )
        return pd.Series(out, index=df.index, dtype=bool)


class in_negate(PredicateBase):
    def __init__(self, predicate: PredicateBase):
        self._p = predicate

    def get_fields(self) -> set[str]:
        return self._p.get_fields()

    def to_column(self) -> Column:
        return ~self._p.to_column()

    def do_include_pandas(self, df: pd.DataFrame) -> pd.Series:
        return ~self._p.do_include_pandas(df)


class in_reduce(PredicateBase):
    """AND/OR (or any binary reduce) over a list of predicates."""

    def __init__(self, predicates: list[PredicateBase], reduce_func):
        self._ps = list(predicates)
        self._reduce = reduce_func  # 'and' | 'or' | callable on Columns

    def get_fields(self) -> set[str]:
        out: set[str] = set()
        for p in self._ps:
            out |= p.get_fields()
        return out

    def to_column(self) -> Column:
        cols = [p.to_column() for p in self._ps]
        if self._reduce == "and":
            return _reduce(lambda a, b: a & b, cols)
        if self._reduce == "or":
            return _reduce(lambda a, b: a | b, cols)
        return _reduce(self._reduce, cols)

    def do_include_pandas(self, df: pd.DataFrame) -> pd.Series:
        series = [p.do_include_pandas(df) for p in self._ps]
        if self._reduce == "and":
            return _reduce(lambda a, b: a & b, series)
        if self._reduce == "or":
            return _reduce(lambda a, b: a | b, series)
        return _reduce(self._reduce, series)


class in_pseudorandom_split(PredicateBase):
    """Deterministic train/val/test splitting (petastorm/predicates.py:144-183).

    ``fraction_list`` partitions [0,1); a row belongs to subset ``i`` iff
    md5_fraction(field) falls in the i-th interval. Key-stable: adding or
    removing other rows never moves a row between subsets (unlike
    ``randomSplit``). Fractions that sum to < 1 leave a discard bucket.
    """

    def __init__(self, fraction_list: list[float], subset_index: int, field: str):
        self._fractions = list(fraction_list)
        self._index = subset_index
        self._field = field
        lo = sum(self._fractions[: self._index])
        hi = lo + self._fractions[self._index]
        self._lo, self._hi = lo, hi

    def get_fields(self) -> set[str]:
        return {self._field}

    def to_column(self) -> Column:
        frac = md5_fraction(self._field)
        return (frac >= F.lit(self._lo)) & (frac < F.lit(self._hi))

    def do_include_pandas(self, df: pd.DataFrame) -> pd.Series:
        import hashlib

        def frac(v) -> float:
            h = hashlib.md5(_spark_cast_string(v).encode()).hexdigest()[:15]
            return int(h, 16) / HASH_SPACE

        f = df[self._field].map(frac)
        return (f >= self._lo) & (f < self._hi)


def split_column(fraction_list: list[float], field) -> Column:
    """Single-scan companion to :class:`in_pseudorandom_split`: a CASE
    expression mapping the key's md5-fraction to its subset index
    (int), so all subsets materialize from ONE scan instead of one
    filtered scan per subset. Rows falling past ``sum(fraction_list)``
    get NULL (the discard bucket). Bit-identical subset assignment to
    the predicate form — same md5-fraction keying."""
    frac = md5_fraction(field)
    expr: Column | None = None
    hi = 0.0
    for i, f in enumerate(fraction_list):
        hi += f
        cond = frac < F.lit(hi)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    return expr.cast("int")


def filter_dataframe(df, predicate: PredicateBase):
    """Apply any predicate to a DataFrame.

    Column-expressible predicates go through ``df.filter`` (pushdown
    eligible). ``in_lambda`` falls back to an Arrow-batched pandas UDF
    over only the fields it reads.
    """
    try:
        return df.filter(predicate.to_column())
    except TypeError:
        pass

    fields = sorted(predicate.get_fields())

    @F.pandas_udf("boolean")
    def _pred(*cols: pd.Series) -> pd.Series:
        pdf = pd.DataFrame({f: c for f, c in zip(fields, cols)})
        return predicate.do_include_pandas(pdf)

    return df.filter(_pred(*[F.col(f) for f in fields]))
