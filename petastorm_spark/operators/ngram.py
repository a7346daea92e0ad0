"""NGram: sliding windows over timestamp-ordered rows (time-series
training samples).

Parity surface: petastorm/ngram.py:20-133 (NGram spec), :225-270
(form_ngram). The reference builds windows inside one row group only
(documented caveat petastorm/ngram.py:85-91) and only on the row
path. This implementation uses ``Window.orderBy`` + ``lead()`` so
windows are global (strictly more complete) and work on any path.

Scale: one shuffle on ``partition_by`` (hash exchange), then a
partition-local sort — the same cost profile as any windowed query;
no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class NGram:
    """Declarative n-gram spec.

    ``fields`` maps offset -> list of column names emitted at that
    offset (petastorm-style per-timestep column sets). Offsets may be
    non-contiguous; window length = max(offsets) - min(offsets) + 1.
    ``delta_threshold``: max allowed difference of consecutive
    ``timestamp_field`` values inside one window.
    ``timestamp_overlap=False`` emits only non-overlapping windows
    (block semantics: consecutive disjoint row blocks, a deterministic
    variant of the reference's greedy skip).
    """

    def __init__(
        self,
        fields: dict[int, list[str]],
        delta_threshold,
        timestamp_field: str,
        timestamp_overlap: bool = True,
    ):
        if not fields:
            raise ValueError("fields must be a non-empty {offset: [columns]}")
        self.fields = {int(k): list(v) for k, v in fields.items()}
        self.delta_threshold = delta_threshold
        self.timestamp_field = timestamp_field
        self.timestamp_overlap = timestamp_overlap
        self.offsets = sorted(self.fields)
        self.length = self.offsets[-1] - self.offsets[0] + 1

    def apply(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        order_tiebreak: list[str] | None = None,
        flat: bool = True,
    ) -> DataFrame:
        """Emit one row per valid window.

        ``flat=True`` names output columns ``t{offset}_{col}``;
        ``flat=False`` emits one struct column ``t{offset}`` per offset.
        """
        ts = self.timestamp_field
        order_cols = [F.col(ts)] + [F.col(c) for c in (order_tiebreak or [])]
        w = (
            Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
        ).orderBy(*order_cols)

        base = self.offsets[0]
        # one projection with ONLY the needed (k, column) leads — a
        # withColumn-per-lead loop would add a plan layer per column
        # (Catalyst analysis blowup) and compute leads never emitted:
        # ts at every step (validity check) + each offset's own fields.
        needed: set[tuple[int, str]] = {
            (k, ts) for k in range(self.length)
        } | {(off - base, c) for off in self.offsets for c in self.fields[off]}
        out = df.select(
            "*",
            *[
                F.lead(c, k).over(w).alias(f"_lead{k}_{c}")
                for k, c in sorted(needed)
            ],
        )

        # validity: every consecutive timestamp delta within threshold,
        # and the window does not run off the end of the partition.
        cond = F.lit(True)
        for k in range(1, self.length):
            prev, cur = f"_lead{k-1}_{ts}", f"_lead{k}_{ts}"
            cond = (
                cond
                & F.col(cur).isNotNull()
                & ((F.col(cur) - F.col(prev)) <= F.lit(self.delta_threshold))
            )

        if not self.timestamp_overlap:
            # greedy disjoint windows are inherently sequential —
            # delegate to the same per-group kernel the reader path
            # uses (applyInPandas), so both paths agree exactly
            return self._apply_greedy(df, partition_by, order_tiebreak, flat)
        out = out.where(cond)

        sel = [F.col(c) for c in (partition_by or [])]
        for off in self.offsets:
            k = off - base
            if flat:
                sel += [
                    F.col(f"_lead{k}_{c}").alias(f"t{off}_{c}")
                    for c in self.fields[off]
                ]
            else:
                sel.append(
                    F.struct(
                        *[
                            F.col(f"_lead{k}_{c}").alias(c)
                            for c in self.fields[off]
                        ]
                    ).alias(f"t{off}")
                )
        return out.select(*sel)

    def _apply_greedy(
        self,
        df: DataFrame,
        partition_by: list[str] | None,
        order_tiebreak: list[str] | None,
        flat: bool,
    ) -> DataFrame:
        """Non-overlapping windows via greedy left-to-right selection,
        executed per group with applyInPandas (Arrow-batched) — the
        exact same kernel as the reader path, so both emit identical
        window sets. Scale: one exchange on partition_by; groups are
        processed independently."""
        import pandas as pd
        from pyspark.sql.types import StructField, StructType

        pcols = list(partition_by or [])
        types = {f.name: f.dataType for f in df.schema.fields}
        out_fields = [StructField(c, types[c], True) for c in pcols]
        flat_cols: list[tuple[str, int, str]] = []
        for off in self.offsets:
            for c in self.fields[off]:
                out_fields.append(StructField(f"t{off}_{c}", types[c], True))
                flat_cols.append((f"t{off}_{c}", off, c))
        out_schema = StructType(out_fields)
        spec = self
        tiebreak = list(order_tiebreak or [])

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for win in spec.form_ngram_dicts(pdf, tiebreak=tiebreak):
                row = {c: pdf[c].iloc[0] for c in pcols}
                for name, off, c in flat_cols:
                    row[name] = getattr(win[off], c)
                rows.append(row)
            return pd.DataFrame(rows, columns=[f.name for f in out_fields])

        if pcols:
            grouped = df.groupBy(*pcols)
        else:  # global greedy selection = one group
            grouped = df.withColumn("_g", F.lit(1)).groupBy("_g")
        out = grouped.applyInPandas(kernel, schema=out_schema)
        if flat:
            return out
        sel = [F.col(c) for c in pcols]
        for off in self.offsets:
            sel.append(
                F.struct(
                    *[F.col(f"t{off}_{c}").alias(c) for c in self.fields[off]]
                ).alias(f"t{off}")
            )
        return out.select(*sel)

    # ---- reader integration (reference behavior: make_reader(schema_
    # fields=NGram) yields one {offset: namedtuple} dict per window,
    # petastorm/ngram.py:205-223 + py_dict_reader_worker.py:171-172) ----

    def form_ngram_dicts(self, pdf, tiebreak: list[str] | None = None):
        """Materialize windows from one decoded pandas batch (rows are
        ts-sorted within the batch; windows do not cross batches — the
        reference's documented row-group caveat, petastorm/ngram.py:85-91).
        Yields {offset: namedtuple} dicts."""
        from collections import namedtuple

        ts = self.timestamp_field
        order_cols = [ts] + [c for c in (tiebreak or []) if c in pdf.columns]
        pdf = pdf.sort_values(order_cols, kind="stable").reset_index(drop=True)
        nts = {
            off: namedtuple(f"ngram_t{off}", self.fields[off], rename=True)
            for off in self.offsets
        }
        base = self.offsets[0]
        n = len(pdf)
        ts_vals = pdf[ts].to_numpy()
        emitted_rows: set[int] = set()
        for start in range(n - self.length + 1):
            ok = all(
                ts_vals[start + k] - ts_vals[start + k - 1] <= self.delta_threshold
                for k in range(1, self.length)
            )
            if not ok:
                continue
            rows = range(start, start + self.length)
            if not self.timestamp_overlap and any(r in emitted_rows for r in rows):
                continue
            emitted_rows.update(rows)
            yield {
                off: nts[off](
                    **{c: pdf.at[start + off - base, c] for c in self.fields[off]}
                )
                for off in self.offsets
            }
