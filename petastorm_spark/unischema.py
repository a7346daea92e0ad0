"""Unischema: one schema declaration rendered into Spark, NumPy, and
(optionally) TF/Torch type systems.

Parity surface (cited for behavior, not copied):
  - ``UnischemaField``            petastorm/unischema.py:50-69
  - numpy->Spark scalar mapping   petastorm/unischema.py:128-154
    (unsigned ints widen to the next signed Spark type — Spark has no
    unsigned types; the original dtype is kept in the JSON sidecar so
    the read path can cast back for a faithful numpy round-trip)
  - ``as_spark_schema``           petastorm/unischema.py:264-281
  - ``create_schema_view``        petastorm/unischema.py:199-240 (regexes
    full-match, petastorm/unischema.py:437-464)
  - ``dict_to_spark_row``         petastorm/unischema.py:359-406
  - null insertion                petastorm/unischema.py:409-424
  - inference                     petastorm/unischema.py:302-353 — ours
    infers from the *Spark* schema instead of arrow, and does NOT drop
    struct/map columns (an upgrade the reference warns about at
    petastorm/unischema.py:338-341)
  - ``decode_row``                petastorm/utils.py:52-85

Schemas serialize to versioned JSON (``to_json``/``from_json``) — never
pickle (reference's own TODO at petastorm/etl/dataset_metadata.py:201-202).
"""

from __future__ import annotations

import re
from collections import namedtuple
from decimal import Decimal

import numpy as np
from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from petastorm_spark.codecs import (
    DataframeColumnCodec,
    ScalarCodec,
    codec_from_json,
)

SIDECAR_VERSION = 1

# numpy scalar dtype -> Spark type; unsigned types widen (no unsigned in Spark).
_NUMPY_TO_SPARK: dict[type, DataType] = {
    np.int8: ByteType(),
    np.uint8: ShortType(),
    np.int16: ShortType(),
    np.uint16: IntegerType(),
    np.int32: IntegerType(),
    np.uint32: LongType(),
    np.int64: LongType(),
    np.float32: FloatType(),
    np.float64: DoubleType(),
    np.bool_: BooleanType(),
    np.datetime64: TimestampType(),
    np.str_: StringType(),
    np.bytes_: BinaryType(),
}

_SPARK_TO_NUMPY: dict[str, type] = {
    "tinyint": np.int8,
    "smallint": np.int16,
    "int": np.int32,
    "bigint": np.int64,
    "float": np.float32,
    "double": np.float64,
    "boolean": np.bool_,
    "string": np.str_,
    "binary": np.bytes_,
    "date": np.datetime64,
    "timestamp": np.datetime64,
}


def numpy_to_spark_type(dtype) -> DataType:
    if dtype in (str, "str"):
        return StringType()
    if dtype in (bytes, "bytes"):
        return BinaryType()
    if dtype is Decimal:
        return DecimalType(38, 18)
    key = np.dtype(dtype).type
    if key not in _NUMPY_TO_SPARK:
        raise TypeError(f"no Spark mapping for numpy dtype {dtype}")
    return _NUMPY_TO_SPARK[key]


class UnischemaField:
    """(name, numpy_dtype, shape, codec, nullable).

    ``shape=()`` → scalar; ``shape=(None, 128)`` → variable first dim.
    ``codec=None`` on a scalar field means 'store natively' (the
    make_batch_reader path for plain parquet stores).
    """

    __slots__ = ("name", "numpy_dtype", "shape", "codec", "nullable")

    def __init__(self, name, numpy_dtype, shape=(), codec=None, nullable=False):
        self.name = name
        self.numpy_dtype = numpy_dtype
        self.shape = tuple(shape) if shape is not None else None
        self.codec: DataframeColumnCodec | None = codec
        self.nullable = nullable

    @property
    def is_tensor(self) -> bool:
        return bool(self.shape)

    def spark_type(self) -> DataType:
        if self.codec is not None:
            return self.codec.spark_dtype()
        return numpy_to_spark_type(self.numpy_dtype)

    def _dtype_name(self) -> str | None:
        # None stays None: np.dtype(None) is float64, which would
        # serialize struct/map/unmapped-array fields as castable
        # float64 in the sidecar and corrupt a later read.
        if self.numpy_dtype is None:
            return None
        if self.numpy_dtype is Decimal:
            return "decimal"
        if self.numpy_dtype in (str, np.str_):
            return "str"
        if self.numpy_dtype in (bytes, np.bytes_):
            return "bytes"
        return np.dtype(self.numpy_dtype).name

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "numpy_dtype": self._dtype_name(),
            "shape": list(self.shape) if self.shape is not None else None,
            "codec": self.codec.to_json() if self.codec else None,
            "nullable": self.nullable,
        }

    @classmethod
    def from_json(cls, d: dict) -> "UnischemaField":
        dtype_name = d["numpy_dtype"]
        if dtype_name is None:
            dtype = None
        elif dtype_name == "decimal":
            dtype = Decimal
        elif dtype_name == "str":
            dtype = np.str_
        elif dtype_name == "bytes":
            dtype = np.bytes_
        else:
            dtype = np.dtype(dtype_name).type
        shape = tuple(d["shape"]) if d["shape"] is not None else None
        return cls(d["name"], dtype, shape, codec_from_json(d["codec"]), d["nullable"])

    def __repr__(self):
        return (
            f"UnischemaField({self.name!r}, {self._dtype_name()}, {self.shape}, "
            f"{self.codec!r}, nullable={self.nullable})"
        )

    def __eq__(self, other):
        return (
            isinstance(other, UnischemaField)
            and self.to_json() == other.to_json()
        )

    def __hash__(self):
        return hash((self.name, self._dtype_name(), self.shape, self.nullable))


class Unischema:
    """An ordered collection of UnischemaFields addressable by name."""

    def __init__(self, name: str, fields: list[UnischemaField]):
        self._name = name
        self._fields = {f.name: f for f in fields}
        self.fields = self._fields  # reference-compatible attribute

    def __getattr__(self, name):
        fields = object.__getattribute__(self, "_fields")
        if name in fields:
            return fields[name]
        raise AttributeError(name)

    def field_names(self) -> list[str]:
        return list(self._fields)

    def as_spark_schema(self) -> StructType:
        return StructType(
            [
                StructField(f.name, f.spark_type(), f.nullable)
                for f in self._fields.values()
            ]
        )

    def make_namedtuple(self, **kwargs) -> tuple:
        return self.namedtuple_cls()(**kwargs)

    def namedtuple_cls(self):
        cls = getattr(self, "_nt_cls", None)
        if cls is None:
            cls = namedtuple(f"{self._name}_view", list(self._fields), rename=True)
            object.__setattr__(self, "_nt_cls", cls)
        return cls

    def create_schema_view(self, fields_or_patterns) -> "Unischema":
        """Project to a subset: items are UnischemaFields, exact names,
        or regexes (full-match, like the reference)."""
        selected: list[UnischemaField] = []
        for f in self._fields.values():
            for sel in fields_or_patterns:
                if isinstance(sel, UnischemaField):
                    if sel.name == f.name:
                        selected.append(f)
                        break
                elif sel == f.name or re.fullmatch(sel, f.name):
                    selected.append(f)
                    break
        if not selected:
            raise ValueError(
                f"no fields of {self._name} matched {fields_or_patterns!r}"
            )
        return Unischema(f"{self._name}_view", selected)

    @classmethod
    def from_spark_schema(
        cls, struct: StructType, name: str = "inferred"
    ) -> "Unischema":
        """Infer a Unischema from a plain Spark schema (the
        make_batch_reader path). Struct/map/array columns are kept
        (numpy_dtype=None → passed through undecoded)."""
        fields = []
        for sf in struct.fields:
            simple = sf.dataType.simpleString()
            if isinstance(sf.dataType, DecimalType):
                fields.append(UnischemaField(sf.name, Decimal, (), None, sf.nullable))
            elif isinstance(sf.dataType, ArrayType):
                elem = sf.dataType.elementType.simpleString()
                np_t = _SPARK_TO_NUMPY.get(elem)
                fields.append(
                    UnischemaField(sf.name, np_t, (None,), None, sf.nullable)
                )
            elif simple in _SPARK_TO_NUMPY:
                fields.append(
                    UnischemaField(
                        sf.name, _SPARK_TO_NUMPY[simple], (), None, sf.nullable
                    )
                )
            else:  # struct/map: keep, undecoded (upgrade over the reference)
                fields.append(UnischemaField(sf.name, None, None, None, sf.nullable))
        return cls(name, fields)

    def to_json(self) -> dict:
        return {
            "version": SIDECAR_VERSION,
            "name": self._name,
            "fields": [f.to_json() for f in self._fields.values()],
        }

    @classmethod
    def from_json(cls, d: dict) -> "Unischema":
        if d.get("version") != SIDECAR_VERSION:
            raise ValueError(f"unsupported unischema sidecar version {d.get('version')}")
        return cls(d["name"], [UnischemaField.from_json(f) for f in d["fields"]])

    def __repr__(self):
        inner = ",\n  ".join(repr(f) for f in self._fields.values())
        return f"Unischema({self._name!r}, [\n  {inner}\n])"


def dict_to_spark_row(unischema: Unischema, row_dict: dict) -> Row:
    """Validate + codec-encode a python dict into a pyspark Row.

    Missing nullable fields become explicit None (reference behavior:
    petastorm/unischema.py:409-424); missing non-nullable fields raise.
    """
    unknown = set(row_dict) - set(unischema.fields)
    if unknown:
        raise ValueError(f"row contains fields not in schema: {sorted(unknown)}")
    encoded = {}
    for field in unischema.fields.values():
        value = row_dict.get(field.name)
        if value is None:
            if not field.nullable and field.name not in row_dict:
                raise ValueError(f"field {field.name} is required")
            if not field.nullable and field.name in row_dict:
                raise ValueError(f"field {field.name} is not nullable")
            encoded[field.name] = None
        elif field.codec is not None:
            encoded[field.name] = field.codec.encode(field, value)
        elif isinstance(value, np.generic):
            encoded[field.name] = value.item()  # Spark rejects numpy scalars
        else:
            encoded[field.name] = value
    return Row(**encoded)


def decode_row(row_dict: dict, unischema: Unischema) -> dict:
    """Apply per-field codec decode / dtype cast to a row dict."""
    out = {}
    for name, value in row_dict.items():
        field = unischema.fields.get(name)
        if field is None or value is None or field.codec is None:
            out[name] = value
        else:
            out[name] = field.codec.decode(field, value)
    return out
