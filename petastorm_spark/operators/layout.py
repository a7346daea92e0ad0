"""Multi-dimensional data layout: Z-order (Morton) interleaving for
write-time clustering.

At 100 TB the scan you never run is the fastest one: parquet keeps
min/max statistics per row group and file, and Spark prunes on them —
but only if the data is CLUSTERED on the filter column. Sorting by one
column makes its stats tight and every other column's stats useless; a
Z-order curve interleaves the bits of several columns so each file
covers a small HYPER-RECTANGLE of the key space, and predicates on ANY
of the interleaved dimensions prune files (the Delta/Iceberg OPTIMIZE
ZORDER story, as a plain column expression).

Everything here is built-in integer arithmetic (shiftright / bitwise
and / multiply-add) — whole-stage-codegen, zero Python, and exactly
reproducible in ANSI SQL, so even the layout math is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 10) -> Column:
    """Morton/Z-value of ``cols``: interleaves the low ``bits`` bits of
    each column round-robin (column 0 contributes the least-significant
    bit). Inputs must already be NON-NEGATIVE integer bucket numbers in
    ``[0, 2^bits)`` — derive them with :func:`int_bucket` (integer
    `div`, engine-exact) or any modular/ranked scheme; values are
    masked to ``bits`` bits defensively.

    The expression is ``bits * len(cols)`` shift-mask-add terms — a
    single codegen'd projection, no shuffle, no UDF. With the default
    10 bits x 2 columns the z-value fits easily in a bigint (up to 3
    columns x 21 bits do).
    """
    ncols = len(cols)
    if ncols < 2:
        raise ValueError(f"zorder needs >= 2 columns, got {ncols}")
    if bits < 1 or bits * ncols > 63:
        raise ValueError(
            f"bits * len(cols) must fit a signed 64-bit int, got {bits}x{ncols}"
        )
    z = F.lit(0).cast("bigint")
    for j, col in enumerate(cols):
        c = (F.col(col) if isinstance(col, str) else col).cast("bigint")
        for i in range(bits):
            z = z + F.shiftright(c, i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (i * ncols + j)
            )
    return z


def zorder_value_sql(exprs: list[str], bits: int = 10) -> str:
    """The ANSI-SQL twin of :func:`zorder_value` (same bit order), for
    DuckDB oracles and SQL-surface users."""
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            terms.append(f"((({e}) >> {i}) & 1) * {1 << (i * len(exprs) + j)}")
    return "(" + " + ".join(terms) + ")"


def int_bucket(col_name: str, width: int) -> Column:
    """Engine-exact integer bucketing: ``col div width`` (NOT double
    division + cast — double quotients lose integer precision near
    2^53 and round instead of truncate; same rule as
    ``temporal.range_join_binned``). Takes the column NAME so the
    `div` operator can be generated as SQL."""
    return F.expr(f"`{col_name}` div {int(width)}")


def zorder_repartition(
    df: DataFrame,
    zcol: Column,
    num_partitions: int,
) -> DataFrame:
    """Range-partition + sort by the z-value so each output file covers
    one compact segment of the curve — i.e. a small hyper-rectangle in
    every interleaved dimension. Follow with ``.write.parquet`` and
    row-group/file stats prune on any dimension.

    Scale: one range exchange (sampled boundaries, AQE-friendly) and a
    partition-local sort — the standard price of any clustered write;
    there is no global sort barrier beyond the exchange itself.
    """
    return (
        df.withColumn("_z", zcol)
        .repartitionByRange(num_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
