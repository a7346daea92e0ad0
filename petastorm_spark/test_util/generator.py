"""Schema-driven random row synthesis (parity: petastorm/generator.py:21-47,
U5) — builds valid row dicts for any Unischema, used by tests and the
bench to fabricate tensor datasets.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np

from petastorm_spark.unischema import Unischema


def random_row(schema: Unischema, rng: np.random.Generator | None = None) -> dict:
    rng = rng or np.random.default_rng()
    row = {}
    for field in schema.fields.values():
        if field.nullable and rng.random() < 0.2:
            row[field.name] = None
            continue
        shape = tuple(d if d is not None else int(rng.integers(1, 4)) for d in (field.shape or ()))
        dt = field.numpy_dtype
        if dt is Decimal:
            row[field.name] = Decimal(f"{int(rng.integers(0, 1000))}.{int(rng.integers(0, 99)):02d}")
        elif dt in (np.str_, str):
            if shape == ():
                row[field.name] = f"s_{int(rng.integers(0, 1 << 30))}"
            else:
                row[field.name] = np.array(
                    [f"s_{int(v)}" for v in rng.integers(0, 1 << 30, int(np.prod(shape)))],
                    dtype=np.str_,
                ).reshape(shape)
        elif dt in (np.bytes_, bytes):
            row[field.name] = rng.integers(0, 255, shape or (8,), dtype=np.uint8).tobytes()
        elif dt is None:
            row[field.name] = None
        elif np.dtype(dt).kind == "b":
            val = rng.integers(0, 2, shape).astype(bool)
            row[field.name] = bool(val) if shape == () else val
        elif np.dtype(dt).kind in "iu":
            info = np.iinfo(np.dtype(dt))
            lo, hi = max(info.min, -(1 << 30)), min(info.max, 1 << 30)
            val = rng.integers(lo, hi, shape).astype(dt)
            val = dt(val) if shape == () else val
            row[field.name] = val
        elif np.dtype(dt).kind == "f":
            val = rng.random(shape).astype(dt)
            row[field.name] = dt(val) if shape == () else val
        elif np.dtype(dt).kind == "M":
            row[field.name] = np.datetime64("2020-01-01") + np.timedelta64(
                int(rng.integers(0, 10_000)), "h"
            )
        else:
            raise TypeError(f"no generator for dtype {dt}")
    return row


def random_rows(schema: Unischema, n: int, seed: int | None = None) -> list[dict]:
    rng = np.random.default_rng(seed)
    return [random_row(schema, rng) for _ in range(n)]
