"""TransformSpec: user transform applied after load+decode.

Parity surface: petastorm/transform.py:27-89 (spec + schema delta) and
the ravel/reshape note at petastorm/arrow_reader_worker.py:224-277.

``func`` takes and returns a ``pandas.DataFrame`` (tensor columns appear
as object columns of numpy arrays after decode). The schema delta is
declared, not inferred:
  - ``edit_fields``: list of (name, numpy_dtype, shape, nullable) added
    or retyped by the transform,
  - ``removed_fields``: names dropped,
  - ``selected_fields``: if set, exact output projection (applied last).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from petastorm_spark.unischema import Unischema, UnischemaField


class TransformSpec:
    def __init__(
        self,
        func: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
        edit_fields: list[tuple] | None = None,
        removed_fields: list[str] | None = None,
        selected_fields: list[str] | None = None,
    ):
        self.func = func
        self.edit_fields = list(edit_fields or [])
        self.removed_fields = list(removed_fields or [])
        self.selected_fields = list(selected_fields) if selected_fields else None


def transform_schema(schema: Unischema, spec: TransformSpec) -> Unischema:
    """Compute the post-transform schema (petastorm/transform.py:60-89)."""
    by_name = dict(schema.fields)
    for name in spec.removed_fields:
        if name not in by_name:
            raise ValueError(f"removed_field {name!r} not in schema")
        del by_name[name]
    for name, np_dtype, shape, nullable in spec.edit_fields:
        by_name[name] = UnischemaField(name, np_dtype, shape, None, nullable)
    if spec.selected_fields is not None:
        missing = [n for n in spec.selected_fields if n not in by_name]
        if missing:
            raise ValueError(f"selected_fields not in schema: {missing}")
        by_name = {n: by_name[n] for n in spec.selected_fields}
    return Unischema("transformed", list(by_name.values()))


def apply_transform_pandas(pdf: pd.DataFrame, spec: TransformSpec) -> pd.DataFrame:
    out = spec.func(pdf) if spec.func is not None else pdf
    drop = [c for c in spec.removed_fields if c in out.columns]
    if drop:
        out = out.drop(columns=drop)
    if spec.selected_fields is not None:
        out = out[spec.selected_fields]
    return out
