"""Read-only interop with datasets written by the original petastorm.

The reference stores a **pickled** ``Unischema`` under the
``dataset-toolkit.unischema.v1`` key and a JSON ``{relative file path:
num row groups}`` map under ``dataset-toolkit.num_row_groups_per_file.v1``
in the parquet ``_common_metadata`` footer
(petastorm/etl/dataset_metadata.py:34-35,194-241). This module loads
both so an existing petastorm dataset decodes tensors here without
rewriting.

Safety: the pickle is parsed with a RESTRICTED unpickler — only the
petastorm schema/codec class names (mapped to local shims), numpy,
decimal, collections, and pyspark.sql.types resolve; anything else
raises. We never execute reference code.

Format notes:
  - reference ``NdarrayCodec`` payloads are plain ``np.save`` bytes —
    byte-compatible with our own ``NdarrayCodec``;
  - reference ``CompressedNdarrayCodec`` uses ``np.savez_compressed``
    (petastorm/codecs.py:174-212), a DIFFERENT container from our
    zlib one, so it maps to :class:`PetastormNpzCodec` below;
  - ``CompressedImageCodec`` maps by (format, quality); decoding real
    png/jpeg stays gated on an image library being importable.
"""

from __future__ import annotations

import io
import json
import pickle
from typing import NamedTuple
from urllib.parse import urlparse

import numpy as np
import pyarrow.fs as pafs
import pyarrow.parquet as pq
from pyspark.sql.types import BinaryType

from petastorm_spark.codecs import (
    _CODEC_CLASSES,
    CompressedImageCodec,
    DataframeColumnCodec,
    NdarrayCodec,
    ScalarCodec,
)
from petastorm_spark.unischema import Unischema, UnischemaField

UNISCHEMA_KEY = b"dataset-toolkit.unischema.v1"
ROW_GROUPS_KEY = b"dataset-toolkit.num_row_groups_per_file.v1"


class PetastormNpzCodec(DataframeColumnCodec):
    """ndarray <-> ``np.savez_compressed`` container — the reference's
    CompressedNdarrayCodec wire format (array stored under key 'arr')."""

    name = "petastorm_npz"

    def spark_dtype(self):
        return BinaryType()

    def encode(self, field, value):
        buf = io.BytesIO()
        np.savez_compressed(buf, arr=np.asarray(value))
        return bytearray(buf.getvalue())

    def decode(self, field, encoded):
        return np.load(io.BytesIO(bytes(encoded)), allow_pickle=False)["arr"]


_CODEC_CLASSES[PetastormNpzCodec.name] = PetastormNpzCodec


# ---- shim classes the restricted unpickler maps reference names to ----------


class _RefUnischemaField(NamedTuple):
    name: str
    numpy_dtype: object
    shape: object
    codec: object = None
    nullable: object = False


class _RefUnischema:
    pass


class _RefScalarCodec:
    pass


class _RefNdarrayCodec:
    pass


class _RefCompressedNdarrayCodec:
    pass


class _RefCompressedImageCodec:
    pass


_SHIMS = {
    ("petastorm.unischema", "Unischema"): _RefUnischema,
    ("petastorm.unischema", "UnischemaField"): _RefUnischemaField,
    ("petastorm.codecs", "ScalarCodec"): _RefScalarCodec,
    ("petastorm.codecs", "NdarrayCodec"): _RefNdarrayCodec,
    ("petastorm.codecs", "CompressedNdarrayCodec"): _RefCompressedNdarrayCodec,
    ("petastorm.codecs", "CompressedImageCodec"): _RefCompressedImageCodec,
}

_SAFE_MODULES = ("numpy", "decimal", "collections", "builtins", "pyspark.sql.types")


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        shim = _SHIMS.get((module, name))
        if shim is not None:
            return shim
        if module in _SAFE_MODULES or module.startswith("numpy."):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} from petastorm metadata"
        )


def _convert_codec(ref) -> DataframeColumnCodec | None:
    if ref is None:
        return None
    if isinstance(ref, _RefScalarCodec):
        return ScalarCodec(ref.__dict__["_spark_type"])
    if isinstance(ref, _RefNdarrayCodec):
        return NdarrayCodec()  # both sides are plain np.save bytes
    if isinstance(ref, _RefCompressedNdarrayCodec):
        return PetastormNpzCodec()
    if isinstance(ref, _RefCompressedImageCodec):
        d = ref.__dict__
        fmt = d.get("_image_codec", ".png").lstrip(".")
        fmt = {"jpg": "jpeg"}.get(fmt, fmt)
        return CompressedImageCodec(fmt, d.get("_quality", 80))
    raise TypeError(f"unsupported reference codec {type(ref).__name__}")


def unischema_from_pickle(payload: bytes) -> Unischema:
    """Parse a reference-pickled Unischema into our JSON-native one."""
    ref = _RestrictedUnpickler(io.BytesIO(payload)).load()
    state = getattr(ref, "__dict__", {})
    name = state.get("_name", "petastorm_dataset")
    ref_fields = state.get("_fields", {})
    fields = []
    for f in ref_fields.values():
        shape = tuple(f.shape) if f.shape is not None else None
        fields.append(
            UnischemaField(
                f.name,
                f.numpy_dtype,
                shape,
                _convert_codec(f.codec),
                bool(f.nullable),
            )
        )
    return Unischema(name, fields)


def _fs_for(url: str) -> tuple[pafs.FileSystem, str] | None:
    try:
        parsed = urlparse(url)
        if parsed.scheme in ("", "file"):
            return pafs.LocalFileSystem(), (parsed.path or url)
        return pafs.FileSystem.from_uri(url)
    except Exception:
        return None


def load_petastorm_metadata(
    dataset_url: str,
) -> tuple[Unischema | None, dict | None]:
    """(Unischema, rowgroup-count map) from a reference dataset's
    ``_common_metadata``, or (None, None) when absent/foreign."""
    pair = _fs_for(dataset_url)
    if pair is None:
        return None, None
    fs, root = pair
    path = root.rstrip("/") + "/_common_metadata"
    try:
        info = fs.get_file_info([path])[0]
        if info.type != pafs.FileType.File:
            return None, None
        with fs.open_input_file(path) as f:
            meta = pq.read_metadata(f).metadata or {}
    except (OSError, pq.lib.ArrowInvalid):
        return None, None
    schema = None
    counts = None
    if UNISCHEMA_KEY in meta:
        schema = unischema_from_pickle(meta[UNISCHEMA_KEY])
    if ROW_GROUPS_KEY in meta:
        try:
            counts = json.loads(meta[ROW_GROUPS_KEY].decode())
        except (ValueError, UnicodeDecodeError):
            counts = None
    return schema, counts
