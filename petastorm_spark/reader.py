"""Read path: make_reader / make_batch_reader re-expressed Spark-first.

Parity surface: petastorm/reader.py:60-206 (make_reader), :209-352
(make_batch_reader), :355-501 (Reader), sharding :573-597, piece-order
shuffle :666-682, in-piece row shuffle (arrow_reader_worker.py:360-371).

Architecture (two-tier, mirrors how the reference's converter works but
with Spark doing the heavy lifting):

  1. **Plan tier (distributed)** — the dataset is a Spark DataFrame;
     projection (schema view), filters, and any heavy transform run as
     a Catalyst plan with parquet pushdown. Only a JVM-only ``Column``
     filter (or a dataframe-based reader, or an explicit local cache
     request for a remote store) forces a one-time Spark-side
     materialization; everything else streams.
  2. **Iteration tier (streaming, constant memory)** — the source
     parquet files are iterated **one row group at a time** through a
     pyarrow FileSystem handle (local, s3://, gs://, hdfs:// — the
     reference's fs_utils.py model): seeded piece-order shuffle per
     epoch (D2), shard selection ``index % shard_count == cur_shard``
     (D1), DNF-filter row-group pruning from parquet statistics,
     in-row-group row shuffle (D3), codec decode (C5) — in threads or
     spawned worker processes — row predicate on decoded values
     (P2/P3), TransformSpec (U1), then rows or column-vector batches
     are yielded as namedtuples. Row-group counts come from the
     metadata sidecar when present, so no footer is opened up front.

At cluster scale the iteration tier runs on each training worker with
a distinct ``cur_shard`` streaming its shard straight from the store —
exactly the reference's distribution model — while the plan tier is a
normal Spark job sized by the cluster.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
from urllib.parse import urlparse

import numpy as np
import pandas as pd
import pyarrow.fs as pafs
import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from petastorm_spark._piece_worker import (
    decode_col,
    dnf_columns,
    dnf_mask,
    is_dnf_filters,
    load_table,
    partition_values,
    rg_may_match,
    scalar_frame,
)
from petastorm_spark.etl.dataset_metadata import SIDECAR_NAME, read_sidecar
from petastorm_spark.predicates import PredicateBase
from petastorm_spark.session import get_spark
from petastorm_spark.transform import (
    TransformSpec,
    apply_transform_pandas,
    transform_schema,
)
from petastorm_spark.unischema import Unischema


def _strip_scheme(path: str) -> str:
    parsed = urlparse(path)
    return parsed.path if parsed.scheme else path


def _is_null_scalar(v) -> bool:
    return v is None or (isinstance(v, float) and np.isnan(v))


def _resolve_fs(url: str) -> tuple[pafs.FileSystem, str] | None:
    """(pyarrow FileSystem, root path) for any URL pyarrow can reach —
    bare paths and file:// map to LocalFileSystem; s3://, gs://,
    hdfs:// go through ``FileSystem.from_uri``. None if the scheme is
    unsupported (caller falls back to Spark-side materialization)."""
    try:
        scheme = urlparse(url).scheme
        if scheme in ("", "file"):
            return pafs.LocalFileSystem(), _strip_scheme(url)
        return pafs.FileSystem.from_uri(url)
    except Exception:
        return None


def _sidecar_via_pyarrow(pfs: pafs.FileSystem, root: str) -> dict | None:
    """The JSON sidecar payload read through a pyarrow filesystem, or
    None when absent — the retry path that keeps a working JVM plan
    tier when only the sidecar read hiccups, and the primary path for
    JVM-unreachable schemes."""
    side = root.rstrip("/") + "/" + SIDECAR_NAME
    if pfs.get_file_info([side])[0].type != pafs.FileType.File:
        return None
    with pfs.open_input_file(side) as fh:
        return json.loads(fh.read().decode())


def _list_parquet_files_fs(fs: pafs.FileSystem, root: str) -> list[str]:
    """Data files under ``root`` on any pyarrow filesystem, skipping
    _metadata/_ps_index/hidden entries at every directory level."""
    info = fs.get_file_info([root])[0]
    if info.type == pafs.FileType.File:
        return [root]
    if info.type != pafs.FileType.Directory:
        raise FileNotFoundError(f"{root} does not exist")
    out = []
    for fi in fs.get_file_info(pafs.FileSelector(root, recursive=True)):
        if fi.type != pafs.FileType.File:
            continue
        rel = fi.path[len(root):].lstrip("/")
        parts = rel.split("/")
        if any(p.startswith(("_", ".")) for p in parts):
            continue
        base = parts[-1]
        if base.endswith(".parquet") or base.startswith("part-"):
            out.append(fi.path)
    return sorted(set(out))


def _parallel_footers(fs: pafs.FileSystem, files: list[str], fn, workers: int = 16):
    """Map ``fn(path, parquet_metadata)`` over file footers in parallel
    (the reference stores rowgroup counts to avoid this scan entirely;
    we do the same via the sidecar, and parallelize the fallback
    instead of petastorm's serial driver loop)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(path: str):
        with fs.open_input_file(path) as f:
            return path, fn(path, pq.ParquetFile(f).metadata)

    if len(files) <= 1:
        return dict(one(p) for p in files)
    with ThreadPoolExecutor(min(workers, len(files))) as ex:
        return dict(ex.map(one, files))


_WIDEN_CHAINS = (
    ("byte", "short", "integer", "long"),
    ("float", "double"),
)


def _widen_types(t1, t2):
    """The wider of two Spark scalar types when one SAFELY widens to
    the other (integral chain byte->short->int->long; float->double —
    the promotions Spark 4's parquet scan performs per file under an
    explicit requested schema), else None. Anything off the two
    chains — including array element changes and int<->float — is a
    genuine conflict, never merged."""
    if t1 == t2:
        return t1
    a, b = t1.typeName(), t2.typeName()
    for chain in _WIDEN_CHAINS:
        if a in chain and b in chain:
            return t1 if chain.index(a) >= chain.index(b) else t2
    return None


def _widened_union_schema(urls: list[str]):
    """Union schema of every parquet footer under ``urls`` with safe
    type widening: (first-seen column order, each column at its widest
    observed type, everything nullable). Raises ValueError on a
    same-name type pair that is not a safe widening. Driver cost: one
    footer read per file (parallelized, metadata-sized) — only paid
    when Spark's own distributed footer merge refused the dataset, so
    the dataset is KNOWN to contain a type change."""
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import StructField, StructType

    merged: dict = {}
    order: list[str] = []
    for u in urls:
        pair = _resolve_fs(u)
        if pair is None:
            raise FileNotFoundError(f"cannot resolve a filesystem for {u!r}")
        pfs, root = pair
        leaves = _list_parquet_files_fs(pfs, root)
        from concurrent.futures import ThreadPoolExecutor

        def one(path, _pfs=pfs):
            with _pfs.open_input_file(path) as fh:
                return path, from_arrow_schema(pq.read_schema(fh))

        with ThreadPoolExecutor(min(16, max(len(leaves), 1))) as ex:
            footers = dict(ex.map(one, leaves))
        for path in leaves:
            for f in footers[path].fields:
                if f.name not in merged:
                    merged[f.name] = f.dataType
                    order.append(f.name)
                    continue
                w = _widen_types(merged[f.name], f.dataType)
                if w is None:
                    raise ValueError(
                        f"column {f.name!r} type "
                        f"{f.dataType.simpleString()} in {path!r} "
                        f"conflicts with {merged[f.name].simpleString()} "
                        "from an earlier file; schema evolution widens "
                        "byte->short->int->long and float->double, "
                        "never converts across kinds"
                    )
                merged[f.name] = w
    return StructType(
        [StructField(n, merged[n], True) for n in order]
    )


def _dnf_to_column(filters) -> Column:
    """Compile DNF tuple filters to a Spark Column so the plan tier
    gets the same semantics (and Catalyst pushdown) the iteration tier
    evaluates with pyarrow stats + pandas masks."""
    from functools import reduce

    from petastorm_spark._piece_worker import dnf_clauses

    def cond(col: str, op: str, val) -> Column:
        c = F.col(col)
        if op in ("=", "=="):
            return c == F.lit(val)
        if op == "!=":
            return c != F.lit(val)
        if op == "<":
            return c < F.lit(val)
        if op == "<=":
            return c <= F.lit(val)
        if op == ">":
            return c > F.lit(val)
        if op == ">=":
            return c >= F.lit(val)
        if op == "in":
            return c.isin(list(val))
        if op == "not in":
            return ~c.isin(list(val))
        raise ValueError(f"unsupported DNF filter op {op!r}")

    clause_cols = [
        reduce(lambda a, b: a & b, [cond(*t) for t in clause])
        for clause in dnf_clauses(filters)
    ]
    return reduce(lambda a, b: a | b, clause_cols)


# A sentinel is a lease: __iter__ refreshes its mtime, so a sentinel
# older than the TTL belongs to a hung/dead/recycled-pid reader and no
# longer pins the cache dir (r3 ADVICE: pid probes alone are blind to
# readers on OTHER hosts of a shared filesystem and can pin forever
# when the pid is recycled).
_SENTINEL_TTL_SEC = 30 * 60


def _cache_dir_in_use(managed_dir: str) -> bool:
    """True if a live Reader holds a sentinel lease in this managed
    cache subdir. Same-host sentinels need a live pid AND a fresh
    lease; foreign-host sentinels (shared filesystem) are trusted
    while their lease is fresh — their pids are unprobeable here."""
    import socket
    import time

    local_host = socket.gethostname()
    try:
        names = os.listdir(managed_dir)
    except OSError:
        return False
    for n in names:
        if not n.startswith(".ps_inuse_"):
            continue
        try:
            age = time.time() - os.path.getmtime(os.path.join(managed_dir, n))
        except OSError:
            continue  # vanished between listdir and stat
        if age > _SENTINEL_TTL_SEC:
            continue  # expired lease: dead, hung, or recycled pid
        tail = n[len(".ps_inuse_"):]
        pid_s, _, host = tail.partition("@")
        if host and host != local_host:
            return True  # fresh foreign-host lease: trust it
        try:
            os.kill(int(pid_s), 0)  # liveness probe, no signal delivered
            return True
        except (ValueError, ProcessLookupError):
            continue  # malformed or dead: stale sentinel
        except PermissionError:
            return True  # alive but other uid
    return False


def _enforce_cache_limit(cache_dir: str, limit_bytes: int, keep: str) -> None:
    """K2 parity (reference local_disk_cache.py:23-82 size limit):
    evict oldest managed cache subdirs until the total is under the
    limit. The subdir just (re)used is never evicted."""
    import warnings

    entries = []
    for d in os.listdir(cache_dir):
        if not d.startswith("_ps_materialized_"):
            continue
        p = os.path.join(cache_dir, d)
        if not os.path.isdir(p):
            continue
        if _cache_dir_in_use(p):
            continue  # a live Reader (this or another process) iterates here
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, names in os.walk(p)
            for f in names
        )
        entries.append((os.path.getmtime(p), p, size))
    total = sum(e[2] for e in entries)
    for _, p, size in sorted(entries):
        if total <= limit_bytes:
            break
        if os.path.abspath(p) == os.path.abspath(keep):
            continue
        shutil.rmtree(p, ignore_errors=True)
        total -= size
        warnings.warn(
            f"cache_size_limit exceeded: evicted oldest cache entry {p} "
            f"({size} bytes)",
            stacklevel=3,
        )


def _list_parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    def visible(f: str) -> bool:
        # skip _metadata/_ps_index/.crc etc. at any directory level
        rel = os.path.relpath(f, path)
        return not any(part.startswith(("_", ".")) for part in rel.split(os.sep))

    files = sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        + glob.glob(os.path.join(path, "**", "part-*"), recursive=True)
        if os.path.isfile(f) and visible(f)
    )
    return sorted(set(files))


class Reader:
    """Iterable over a dataset's rows (or column-vector batches).

    Use :func:`make_reader` / :func:`make_batch_reader` instead of
    constructing directly. Context-manager aware; ``close()`` removes
    any materialization cache this reader created.
    """

    def __init__(
        self,
        dataset_url: str | None = None,
        *,
        spark: SparkSession | None = None,
        dataframe: DataFrame | None = None,
        schema_fields: list | None = None,
        predicate: PredicateBase | None = None,
        transform_spec: TransformSpec | None = None,
        filters=None,
        shuffle_row_groups: bool = False,
        shuffle_rows: bool = False,
        seed: int | None = None,
        cur_shard: int | None = None,
        shard_count: int | None = None,
        num_epochs: int | None = 1,
        batched: bool = False,
        cache_dir: str | None = None,
        rowgroup_selector=None,
        shuffle_row_drop_partitions: int = 1,
        workers_count: int = 4,
        reader_pool_type: str = "thread",
        cache_type: str | None = None,
        cache_location: str | None = None,
        cache_size_limit: int | None = None,
        schema_evolution: bool = False,
        **compat_kwargs,
    ):
        # Drop-in signature compatibility with petastorm's make_reader
        # (petastorm/reader.py:60-206): knobs that are meaningless under
        # the Spark architecture are accepted and warned about, so
        # existing call sites run unchanged.
        _IGNORED = {
            "pyarrow_serialize",
            "results_queue_size",
            "zmq_copy_buffers",
            "hdfs_driver",
            "infer_schema_from_first_row",
            "cache_row_size_estimate",
            "cache_extra_settings",
            "shard_seed",
        }
        unknown = set(compat_kwargs) - _IGNORED
        if unknown:
            raise TypeError(f"unexpected reader arguments: {sorted(unknown)}")
        if compat_kwargs:
            import warnings

            warnings.warn(
                f"ignoring petastorm-compat args with no Spark-side effect: "
                f"{sorted(compat_kwargs)}",
                stacklevel=3,
            )
        if cache_type not in (None, "null", "local-disk"):
            raise ValueError(f"unsupported cache_type {cache_type!r}")
        if cache_type == "local-disk" and cache_dir is None:
            cache_dir = cache_location
        if (dataset_url is None) == (dataframe is None):
            raise ValueError("exactly one of dataset_url / dataframe is required")
        # Multi-URL datasets (reference petastorm/reader.py:51-57,209):
        # a list of file/dir URLs sharing one scheme reads as ONE
        # dataset — piece lists merge, sharding spans all of them.
        urls: list[str] | None = None
        if dataset_url is not None:
            if isinstance(dataset_url, (list, tuple)):
                if not dataset_url:
                    raise ValueError("dataset url list must be non-empty")
                urls = [str(u) for u in dataset_url]
                schemes = {
                    u.split("://", 1)[0] if "://" in u else "file" for u in urls
                }
                if len(schemes) > 1:
                    raise ValueError(
                        "all dataset URLs must share one scheme, got "
                        f"{sorted(schemes)}"
                    )
                dataset_url = urls[0] if len(urls) == 1 else None
            else:
                urls = [dataset_url]
        if (cur_shard is None) != (shard_count is None):
            raise ValueError("cur_shard and shard_count must be set together")
        if shard_count is not None and not 0 <= cur_shard < shard_count:
            raise ValueError(
                f"cur_shard must be in [0, {shard_count}), got {cur_shard}"
            )

        self._spark = spark or (dataframe.sparkSession if dataframe is not None else get_spark())
        from petastorm_spark.session import ensure_session_confs

        ensure_session_confs(self._spark)
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        # pool parity (petastorm reader_pool_type thread|process|dummy):
        # 'thread' prefetches row-group decodes in threads; 'process'
        # moves the GIL-bound codec decode into spawned worker
        # processes (reference workers_pool/process_pool.py); 'dummy'
        # is synchronous.
        if reader_pool_type not in ("thread", "process", "dummy"):
            raise ValueError(f"unsupported reader_pool_type {reader_pool_type!r}")
        self._pool_type = reader_pool_type
        self._workers = 1 if reader_pool_type == "dummy" else max(1, workers_count)
        self._predicate = predicate
        self._schema_evolution = bool(schema_evolution)
        self._spec = transform_spec
        self._shuffle_row_groups = shuffle_row_groups
        self._shuffle_rows = shuffle_rows
        self._cur_shard = cur_shard
        self._shard_count = shard_count
        self._num_epochs = num_epochs
        self._batched = batched
        # D4 (petastorm/reader.py:654-664): split each row group into k
        # strided slices read as separate pieces — trades extra reads
        # for shuffle decorrelation.
        self._drop_parts = max(1, int(shuffle_row_drop_partitions))
        self._owned_cache: str | None = None
        self._managed_cache: str | None = None
        self._sentinel: str | None = None
        self.last_row_consumed = False

        # ---- plan tier -----------------------------------------------------
        self._sidecar_counts: dict | None = None
        # schema evolution: later-written files may ADD nullable
        # columns (mergeSchema unions footers JVM-side; the iteration
        # tier null-fills columns absent from an old file via
        # partition_values missing_ok) or WIDEN a column along the safe
        # chains int32->int64 / float->double (r13): Spark's merge
        # refuses type changes, so a CANNOT_MERGE_SCHEMAS read retries
        # under the explicit widened union schema — the parquet scan
        # promotes per file — and the iteration tier's decode_series
        # cast to the unified Unischema dtype widens per piece.
        # Cross-kind changes (int<->float, string<->numeric, array
        # element changes) still raise.
        if dataframe is not None:
            df = dataframe
            stored = None
        elif dataset_url is not None:
            struct = None

            def _jvm_read_single():
                # scoped to the parquet read ONLY: a transient sidecar
                # failure on a JVM-reachable dataset must not discard
                # the working plan tier (round-11 advice)
                try:
                    return self._reader_with_merge().parquet(dataset_url)
                except Exception as exc:
                    # mergeSchema refuses type CHANGES outright; with
                    # schema_evolution, safe widenings (int32->int64,
                    # float->double) re-read under an explicit widened
                    # union schema (Spark's scan promotes per file);
                    # genuine conflicts raise ValueError from the union
                    if self._schema_evolution and (
                        "CANNOT_MERGE_SCHEMAS" in str(exc)
                    ):
                        st = _widened_union_schema([dataset_url])
                        return self._spark.read.schema(st).parquet(
                            dataset_url
                        )
                    raise

            try:
                df = _jvm_read_single()
            except ValueError:
                raise  # widening conflict — never a filesystem problem
            except Exception:
                # The JVM has no filesystem for this scheme (e.g. s3a://
                # without hadoop-aws on the driver classpath). The DIRECT
                # tier still reaches it through pyarrow's from_uri:
                # derive the schema from a parquet footer, read the
                # sidecar through the same pyarrow filesystem, and run
                # plan-tier-less (self.dataframe stays None).
                pair = _resolve_fs(dataset_url)
                if pair is None:
                    raise
                pfs, root = pair
                leaves = _list_parquet_files_fs(pfs, root)
                if not leaves:
                    raise
                from pyspark.sql.pandas.types import from_arrow_schema

                if self._schema_evolution:
                    struct = _widened_union_schema([dataset_url])
                else:
                    with pfs.open_input_file(leaves[0]) as fh:
                        struct = from_arrow_schema(pq.read_schema(fh))
                df = None
                payload = _sidecar_via_pyarrow(pfs, root)
            else:
                try:
                    payload = read_sidecar(self._spark, dataset_url)
                except Exception:
                    # keep the JVM DataFrame; retry just the sidecar
                    # through pyarrow (None = sidecar genuinely absent).
                    # The retry itself may also fail (fs error after
                    # resolution succeeds) — a doubly-failing sidecar
                    # must degrade to payload=None, never abort a
                    # dataset whose parquet read succeeded.
                    try:
                        pair = _resolve_fs(dataset_url)
                        payload = (
                            _sidecar_via_pyarrow(*pair)
                            if pair is not None
                            else None
                        )
                    except Exception:
                        payload = None
            if payload is not None:
                stored = Unischema.from_json(payload["unischema"])
                self._sidecar_counts = payload.get("row_groups")
            else:
                # interop: a dataset written by original petastorm keeps
                # its pickled Unischema + rowgroup counts in
                # _common_metadata — load them so tensor columns decode
                from petastorm_spark.etl.petastorm_compat import (
                    load_petastorm_metadata,
                )

                stored, self._sidecar_counts = load_petastorm_metadata(dataset_url)
        else:
            # multi-URL: validate the shards agree on a schema (name ->
            # type, order-insensitive) before merging; one footer-only
            # read per URL, driver-side metadata cost only.
            def _check(u, fields, first_fields):
                if self._schema_evolution:
                    # union of fields; same-name types may WIDEN along
                    # the safe chains (int32->int64, float->double);
                    # anything else conflicts and raises
                    merged = dict(first_fields or {})
                    for k, t in fields.items():
                        if k in merged and merged[k] != t:
                            w = _widen_types(merged[k], t)
                            if w is None:
                                raise ValueError(
                                    f"dataset URL {u!r} column {k!r} type "
                                    f"{t} conflicts with {merged[k]} from "
                                    "an earlier URL; schema evolution "
                                    "merges columns and widens "
                                    "int->long / float->double, never "
                                    "converts across kinds"
                                )
                            merged[k] = w
                        else:
                            merged[k] = t
                    return merged
                if first_fields is not None and fields != first_fields:
                    raise ValueError(
                        f"dataset URL {u!r} schema {sorted(fields)} is "
                        f"incompatible with {urls[0]!r} "
                        f"({sorted(first_fields)}); multi-URL datasets "
                        "must share one schema"
                    )
                return fields

            struct = None
            try:
                first_fields = None
                for u in urls:
                    first_fields = _check(u, {
                        f.name: f.dataType
                        for f in self._spark.read.parquet(u).schema.fields
                    }, first_fields)
                try:
                    df = self._reader_with_merge().parquet(*urls)
                except Exception as exc:
                    # widened types across (or within) URLs: mergeSchema
                    # refuses the type change; re-read under the
                    # explicit widened union schema (see single-URL path)
                    if self._schema_evolution and (
                        "CANNOT_MERGE_SCHEMAS" in str(exc)
                    ):
                        st = _widened_union_schema(urls)
                        df = self._spark.read.schema(st).parquet(*urls)
                    else:
                        raise
            except ValueError:
                raise
            except Exception:
                # The JVM has no filesystem for this scheme (e.g. s3a://
                # without hadoop-aws on the driver classpath). The DIRECT
                # tier still reaches it through pyarrow's from_uri, so
                # derive + validate the schema from parquet footers and
                # run plan-tier-less (self.dataframe stays None; a
                # JVM-only Column filter then raises below).
                from pyspark.sql.pandas.types import from_arrow_schema

                pairs = [_resolve_fs(u) for u in urls]
                if any(p is None for p in pairs):
                    raise
                first_fields = None
                struct = None
                from pyspark.sql.types import StructField, StructType

                for (pfs, root), u in zip(pairs, urls):
                    leaves = _list_parquet_files_fs(pfs, root)
                    if not leaves:
                        raise FileNotFoundError(f"no parquet files under {u}")
                    with pfs.open_input_file(leaves[0]) as fh:
                        st = from_arrow_schema(pq.read_schema(fh))
                    struct = struct or st
                    first_fields = _check(
                        u, {f.name: f.dataType for f in st.fields}, first_fields
                    )
                if self._schema_evolution and first_fields is not None:
                    # union schema across URLs, evolved columns nullable
                    # and widened columns at their WIDEST type (the
                    # _check merge already applied the widening chains)
                    struct = StructType(
                        [
                            StructField(k, t, True)
                            for k, t in first_fields.items()
                        ]
                    )
                df = None
            stored = None  # petastorm sidecars are per-dataset: plain-store path

        full_schema = stored or Unischema.from_spark_schema(
            df.schema if df is not None else struct
        )

        # reference behavior: schema_fields may be an NGram spec — the
        # reader then yields {offset: namedtuple} window dicts
        # (petastorm/reader.py:196-200; not supported on the batch path,
        # petastorm/arrow_reader_worker.py:99)
        from petastorm_spark.operators.ngram import NGram

        self._ngram: NGram | None = None
        if isinstance(schema_fields, NGram):
            if batched:
                raise NotImplementedError(
                    "NGram is not supported by make_batch_reader (reference parity)"
                )
            if shuffle_row_drop_partitions > 1:
                raise ValueError(
                    "NGram cannot be combined with shuffle_row_drop_partitions: "
                    "strided slicing changes consecutive-row timestamp deltas "
                    "and would silently drop valid windows"
                )
            self._ngram = schema_fields
            needed = sorted(
                {c for cols in self._ngram.fields.values() for c in cols}
                | {self._ngram.timestamp_field}
            )
            schema_fields = needed

        if schema_fields is not None:
            view = full_schema.create_schema_view(schema_fields)
        else:
            view = full_schema
        self._storage_schema = view
        self._full_schema = full_schema
        # JSON forms cross the process-pool boundary (schemas hold
        # dynamically-created namedtuple classes, so never pickled)
        self._storage_json = json.dumps(view.to_json(), sort_keys=True)
        self._full_json = json.dumps(full_schema.to_json(), sort_keys=True)

        # Final (post-transform) schema the consumer sees.
        self.schema = transform_schema(view, self._spec) if self._spec else view

        # Columns needed from storage: view + predicate + DNF filter
        # columns. ``filters`` accepts either a Spark Column (plan-tier
        # only) or petastorm/pyarrow-style DNF tuples, which the
        # iteration tier can evaluate itself (stats pruning + row mask)
        # on ANY filesystem without materializing.
        self._dnf = filters if (filters is not None and is_dnf_filters(filters)) else None
        col_filter: Column | None = (
            filters if (filters is not None and self._dnf is None) else None
        )
        if col_filter is not None:
            # Compile simple comparison Columns to DNF tuples so the
            # direct streaming tier (and rowgroup stats pruning) applies
            # to them too — a filters=Column reader over a 100 TB store
            # must not materialize a filtered copy to driver-local disk.
            from petastorm_spark.plans.filter_compile import column_to_dnf

            compiled = column_to_dnf(col_filter)
            if compiled is not None:
                self._dnf = compiled
                col_filter = None
        need = list(view.fields)
        if predicate is not None:
            need += [f for f in predicate.get_fields() if f not in need]
        if self._dnf is not None:
            need += [c for c in dnf_columns(self._dnf) if c not in need]
        self._read_columns = need

        # Index selection happens on the SOURCE dataset before any
        # materialization — the pruned file list feeds both the Spark
        # plan and the direct iteration path.
        selected_files: set[str] | None = None
        if rowgroup_selector is not None:
            if dataset_url is None:
                raise ValueError("rowgroup_selector requires a dataset_url reader")
            selected_files = {
                _strip_scheme(f)
                for f in rowgroup_selector.select_files(self._spark, dataset_url)
            }
            if not selected_files:
                raise ValueError("rowgroup_selector matched no files")
            # basePath keeps hive partition columns alive when reading
            # leaf files directly
            df = (
                self._spark.read.option("basePath", dataset_url)
                .parquet(*sorted(selected_files))
            )

        if df is None:
            # JVM-unreachable scheme (see the multi-URL footer fallback):
            # the direct tier streams via pyarrow; there is no plan-tier
            # DataFrame to filter, so a JVM-only Column filter cannot run
            if col_filter is not None:
                raise ValueError(
                    "filters=<Column> needs the Spark plan tier, but the "
                    "JVM has no filesystem for this URL scheme; pass "
                    "pyarrow-style DNF tuples instead"
                )
            self.dataframe = None
        else:
            plan = df.select(*need) if set(need) != set(df.columns) else df
            if self._dnf is not None:
                plan = plan.filter(_dnf_to_column(self._dnf))
            elif col_filter is not None:
                plan = plan.filter(col_filter)
            self.dataframe = plan

        # Direct-iteration path: stream row groups straight from the
        # source filesystem (local, file://, s3://, gs://, hdfs:// —
        # anything pyarrow's FileSystem.from_uri reaches). Only a
        # JVM-only Column filter, an exotic scheme, or an explicit
        # local cache request for a remote store forces a Spark-side
        # materialization.
        self._fs: pafs.FileSystem = pafs.LocalFileSystem()
        self._direct_root: str | None = None
        fs_pairs = (
            [_resolve_fs(u) for u in urls] if urls is not None else None
        )
        if (
            fs_pairs is not None
            and all(p is not None for p in fs_pairs)
            and col_filter is None
            and (cache_dir is None or isinstance(fs_pairs[0][0], pafs.LocalFileSystem))
        ):
            # one scheme -> one fs implementation; roots may be many
            self._fs = fs_pairs[0][0]
            self._direct_root = fs_pairs[0][1]
            files = []
            for _, root in fs_pairs:
                files.extend(_list_parquet_files_fs(self._fs, root))
            if selected_files is not None:
                files = [f for f in files if _strip_scheme(f) in selected_files]
            self._files = files
            if len(fs_pairs) > 1:
                # sidecar rowgroup counts are keyed relative to ONE
                # root; a merged dataset always takes the footer scan
                self._sidecar_counts = None
        elif df is None:
            # plan-tier-less remote reader (JVM-unreachable scheme) that
            # also failed direct-tier eligibility: nothing can serve it
            raise ValueError(
                "the JVM has no filesystem for this URL scheme and the "
                "direct pyarrow tier is unavailable (cache_dir over a "
                "remote store, or an unresolvable URL); drop cache_dir "
                "or use a scheme one of the tiers reaches"
            )
        elif cache_dir is not None:
            # user-managed cache dir: materialize into a managed
            # SUBDIRECTORY (an overwrite-write into the dir itself would
            # wipe unrelated user files), keyed by a STABLE content
            # descriptor — semanticHash() changes across JVM restarts
            # (verified empirically), which would defeat cross-run
            # reuse and grow the cache unboundedly. Descriptor: source
            # url + projected columns + filter text; dataframe-based
            # readers fall back to semanticHash (session-lifetime reuse
            # only, documented).
            import hashlib

            if urls is not None:
                desc = "|".join(
                    ["|".join(urls), ",".join(sorted(need)), str(filters)]
                )
                key = hashlib.sha256(desc.encode()).hexdigest()[:12]
            else:
                key = f"sess{plan.semanticHash() & 0xFFFFFFFF:08x}"
            managed = os.path.join(cache_dir, f"_ps_materialized_{key}")
            existing = (
                _list_parquet_files(managed) if os.path.isdir(managed) else []
            )
            if not existing:
                plan.write.mode("overwrite").parquet(managed)
                existing = _list_parquet_files(managed)
            else:
                os.utime(managed)  # refresh LRU rank on reuse
            # pin against concurrent eviction while this Reader is alive
            self._managed_cache = managed
            import socket

            self._sentinel = os.path.join(
                managed, f".ps_inuse_{os.getpid()}@{socket.gethostname()}"
            )
            with open(self._sentinel, "w"):
                pass
            if cache_size_limit is not None:
                _enforce_cache_limit(cache_dir, cache_size_limit, keep=managed)
            self._files = existing
        else:
            if urls is not None and col_filter is not None:
                # Residual JVM-only Column filter over a URL-addressed
                # store: a silent driver-local tempdir write would not
                # survive cluster mode (executors write where only the
                # driver iterates) and copies the filtered scan to one
                # machine's disk. Demand an explicit durable location.
                raise ValueError(
                    "filters=<Column> could not be compiled to DNF for "
                    "direct streaming (only comparison/in/and/or/not "
                    "over plain columns and primitive literals compile)."
                    " Pass pyarrow-style DNF filter tuples, or an "
                    "explicit cache_dir on a durable filesystem to "
                    "materialize the filtered scan."
                )
            # dataframe-based reader: an arbitrary Spark plan has no
            # source files to stream, so a materialization is inherent.
            self._owned_cache = tempfile.mkdtemp(prefix="pstorm_cache_")
            plan.write.mode("overwrite").parquet(self._owned_cache)
            self._files = _list_parquet_files(self._owned_cache)
        if not self._files:
            raise ValueError(
                f"no parquet files found for {urls or 'dataframe'}"
            )

        # ---- piece list (one per row group) --------------------------------
        # Row-group counts come from the metadata sidecar when present
        # (no footer opened at all — the reference's
        # num_row_groups_per_file map, same idea); otherwise a PARALLEL
        # footer scan, never a serial per-file driver loop. With DNF
        # filters the footer scan also prunes row groups whose min/max
        # statistics cannot match.
        self._pieces: list[tuple[str, int, int]] = []
        if self._dnf is not None and self._direct_root is not None:
            dnf = self._dnf
            keep = _parallel_footers(
                self._fs,
                self._files,
                lambda p, md: (
                    md.num_row_groups,
                    [
                        rg
                        for rg in range(md.num_row_groups)
                        if rg_may_match(
                            md.row_group(rg),
                            [md.schema.column(i).name for i in range(md.num_columns)],
                            dnf,
                        )
                    ],
                ),
            )
            unpruned_rgs = sum(keep[f][0] for f in self._files)
            rgs_per_file = {f: keep[f][1] for f in self._files}
        else:
            counts = self._rowgroup_counts_from_sidecar()
            if counts is None:
                counts = _parallel_footers(
                    self._fs, self._files, lambda p, md: md.num_row_groups
                )
            unpruned_rgs = sum(counts[f] for f in self._files)
            rgs_per_file = {f: range(counts[f]) for f in self._files}
        for f in self._files:
            for rg in rgs_per_file[f]:
                for sl in range(self._drop_parts):
                    self._pieces.append((f, rg, sl))
        # Validate shard_count against the UNPRUNED piece count: a
        # selective DNF filter (or absent parquet stats) must not turn a
        # working sharded read into a hard error — shards emptied by
        # pruning simply yield nothing, matching the materialized path.
        if shard_count is not None and unpruned_rgs * self._drop_parts < shard_count:
            raise ValueError(
                f"{unpruned_rgs * self._drop_parts} row groups < "
                f"{shard_count} shards; write the dataset with "
                "more/smaller row groups"
            )
        self._nt = self.schema.namedtuple_cls()

    # ---- iteration tier ----------------------------------------------------

    def _epoch_pieces(self) -> list[tuple[str, int]]:
        order = np.arange(len(self._pieces))
        # D1: shard by PIECE INDEX before any shuffle (reference
        # petastorm/reader.py:596 `index % shard_count == cur_shard`) —
        # shards stay disjoint across workers even with
        # shuffle_row_groups=True and per-worker default RNGs; each
        # worker then shuffles only its own shard.
        if self._shard_count is not None:
            order = order[self._cur_shard :: self._shard_count]
        if self._shuffle_row_groups:
            self._rng.shuffle(order)
        return [self._pieces[i] for i in order]

    def _rowgroup_counts_from_sidecar(self) -> dict | None:
        """Per-file row-group counts from the metadata sidecar — valid
        only on the direct path over the original dataset files."""
        if self._sidecar_counts is None or self._direct_root is None:
            return None
        root = self._direct_root.rstrip("/")
        by_path = {f"{root}/{rel}": n for rel, n in self._sidecar_counts.items()}
        if all(f in by_path for f in self._files):
            return {f: by_path[f] for f in self._files}
        return None  # stale/partial sidecar: fall back to footer scan

    def _decode_piece(
        self, path: str, rg: int, sl: int = 0, rng: np.random.Generator | None = None
    ) -> pd.DataFrame | None:
        # The piece stays an ARROW table until each column decodes:
        # codec payloads reach the codec as zero-copy memoryview slices
        # of the arrow data buffer instead of per-row python bytes via
        # to_pandas (which was ~30% of per-piece wall on the PNG bench).
        table = load_table(
            self._fs, path, rg, sl, self._drop_parts, self._read_columns
        )
        parts = partition_values(
            path,
            self._read_columns,
            table.column_names,
            self._storage_schema,
            self._schema_evolution,
        )
        sel = None  # surviving row indices; None = all rows
        if self._dnf is not None:
            m = dnf_mask(
                scalar_frame(table, parts, dnf_columns(self._dnf)), self._dnf
            )
            if not m.any():
                return None
            sel = np.nonzero(m)[0]

        # Two-phase decode (reference py_dict_reader_worker.py:222-232):
        # 1. decode the PREDICATE columns, evaluate, filter;
        # 2. decode the remaining view columns for surviving rows only.
        # The predicate therefore always sees decoded values (ndarrays,
        # numpy-dtyped scalars), never np.save/compressed bytes.
        done: dict[str, pd.Series] = {}
        if self._predicate is not None:
            pred_cols = sorted(self._predicate.get_fields())
            for name in pred_cols:
                field = self._full_schema.fields.get(name)
                done[name] = decode_col(field, table, parts, name, sel)
            mask = np.asarray(
                self._predicate.do_include_pandas(pd.DataFrame(done)), dtype=bool
            )
            if not mask.any():
                return None
            sel = (np.arange(len(table)) if sel is None else sel)[mask]
            done = {
                n: s[mask].reset_index(drop=True)
                for n, s in done.items()
                if n in self._storage_schema.fields
            }

        # codec decode + dtype restore, view columns only
        out = {}
        for name, field in self._storage_schema.fields.items():
            if name in done:
                out[name] = done[name]
            else:
                out[name] = decode_col(field, table, parts, name, sel)
        decoded = pd.DataFrame(out)

        if self._spec is not None:
            decoded = apply_transform_pandas(decoded, self._spec)

        if self._shuffle_rows and len(decoded) > 1:
            rng = rng if rng is not None else self._rng
            decoded = decoded.iloc[rng.permutation(len(decoded))].reset_index(
                drop=True
            )
        return decoded

    def _batch_to_vectors(self, pdf: pd.DataFrame):
        vals = {}
        for name in self._nt._fields:
            field = self.schema.fields.get(name)
            col = pdf[name]
            if field is not None and field.is_tensor:
                arrs = list(col)
                fixed = field.shape is not None and all(
                    d is not None for d in field.shape
                )
                if fixed and arrs and all(a is not None for a in arrs):
                    vals[name] = np.stack(arrs)
                else:
                    out = np.empty(len(arrs), dtype=object)
                    out[:] = arrs
                    vals[name] = out
            else:
                vals[name] = col.to_numpy()
        return self._nt(**vals)

    def _piece_stream(self):
        """(path, rg, slice, rng) across all epochs. Per-piece RNGs are
        derived from (seed, epoch, index) so decode order — including
        threaded prefetch — never changes results."""
        epoch = 0
        while self._num_epochs is None or epoch < self._num_epochs:
            for idx, (path, rg, sl) in enumerate(self._epoch_pieces()):
                rng = np.random.default_rng(
                    None if self._seed is None else (self._seed, epoch, idx)
                )
                yield path, rg, sl, rng
            epoch += 1

    def _emit(self, pdf):
        if pdf is None or not len(pdf):
            return
        if self._ngram is not None:
            yield from self._ngram.form_ngram_dicts(pdf)
        elif self._batched:
            yield self._batch_to_vectors(pdf)
        else:
            cols = [pdf[n] for n in self._nt._fields]
            yield from (self._nt(*vals) for vals in zip(*cols))

    def _post_process(self, pdf, rng) -> pd.DataFrame | None:
        """Parent-side tail of a process-pool piece: the worker already
        decoded every read column, so the predicate sees decoded values
        here too; then view projection, transform, row shuffle."""
        if pdf is None or not len(pdf):
            return None
        if self._predicate is not None:
            mask = np.asarray(self._predicate.do_include_pandas(pdf), dtype=bool)
            if not mask.any():
                return None
            pdf = pdf[mask].reset_index(drop=True)
        pdf = pdf[[n for n in self._storage_schema.fields]]
        if self._spec is not None:
            pdf = apply_transform_pandas(pdf, self._spec)
        if self._shuffle_rows and len(pdf) > 1:
            pdf = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
        return pdf

    def _reader_with_merge(self):
        r = self._spark.read
        return r.option("mergeSchema", "true") if self._schema_evolution else r

    def _proc_task(self, path: str, rg: int, sl: int) -> tuple:
        return (
            self._fs, path, rg, sl, self._drop_parts, self._read_columns,
            self._storage_json, self._full_json, self._dnf,
            self._schema_evolution,
        )

    def __iter__(self):
        self.last_row_consumed = False
        if self._managed_cache is not None:
            try:  # refresh LRU rank so a mid-epoch reader isn't "oldest"
                os.utime(self._managed_cache)
            except OSError:
                pass
        if self._sentinel is not None:
            try:  # refresh the pin lease (see _SENTINEL_TTL_SEC)
                os.utime(self._sentinel)
            except OSError:
                pass
        if self._pool_type == "process":
            # spawned workers do the GIL-bound IO + codec decode;
            # closures (predicate/transform) never cross the boundary —
            # they run parent-side on the decoded frames.
            import multiprocessing
            from collections import deque
            from concurrent.futures import ProcessPoolExecutor

            from petastorm_spark._piece_worker import process_piece

            ctx = multiprocessing.get_context("spawn")
            with ProcessPoolExecutor(self._workers, mp_context=ctx) as pool:
                window: deque = deque()
                for path, rg, sl, rng in self._piece_stream():
                    window.append(
                        (pool.submit(process_piece, self._proc_task(path, rg, sl)), rng)
                    )
                    if len(window) >= self._workers * 2:
                        fut, r = window.popleft()
                        yield from self._emit(self._post_process(fut.result(), r))
                while window:
                    fut, r = window.popleft()
                    yield from self._emit(self._post_process(fut.result(), r))
        elif self._workers <= 1:
            for piece in self._piece_stream():
                yield from self._emit(self._decode_piece(*piece))
        else:
            # bounded prefetch: up to 2x workers row groups in flight,
            # consumed in submission order (round-robin determinism,
            # like the reference's thread pool result draining)
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self._workers) as pool:
                window: deque = deque()
                for piece in self._piece_stream():
                    window.append(pool.submit(self._decode_piece, *piece))
                    if len(window) >= self._workers * 2:
                        yield from self._emit(window.popleft().result())
                while window:
                    yield from self._emit(window.popleft().result())
        self.last_row_consumed = True

    # ---- lifecycle ---------------------------------------------------------

    def close(self) -> None:
        if self._owned_cache and os.path.isdir(self._owned_cache):
            shutil.rmtree(self._owned_cache, ignore_errors=True)
            self._owned_cache = None
        if self._sentinel is not None:
            try:
                os.unlink(self._sentinel)
            except OSError:
                pass
            self._sentinel = None

    def reset(self) -> None:
        """Reference API compat (petastorm Reader.reset): our reader
        supports repeated iteration until close(), so reset only clears
        the consumed flag."""
        self.last_row_consumed = False

    stop = close  # reference API alias
    join = close

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def make_reader(dataset_url: str | None = None, **kwargs) -> Reader:
    """Row-oriented reader over a (petastorm-style or plain) parquet
    dataset: yields one namedtuple per row with tensor fields decoded.
    Single URL only (reference parity, petastorm/reader.py:60)."""
    if isinstance(dataset_url, (list, tuple)):
        raise ValueError(
            "make_reader accepts a single dataset URL; use "
            "make_batch_reader for a list of URLs (reference parity)"
        )
    return Reader(dataset_url, batched=False, **kwargs)


def make_batch_reader(dataset_url_or_urls=None, **kwargs) -> Reader:
    """Columnar reader: yields one namedtuple of column vectors per row
    group (post filter/transform). Accepts one parquet URL or a list of
    same-scheme URLs merged as a single dataset (reference
    petastorm/reader.py:51-57,209)."""
    return Reader(dataset_url_or_urls, batched=True, **kwargs)
