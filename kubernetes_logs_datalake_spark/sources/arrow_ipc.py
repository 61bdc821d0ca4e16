"""Arrow IPC (Feather v2) source and sink.

The reference writes every record batch twice: Parquet and Arrow IPC
with ZSTD body compression and int8-dictionary-encoded low-cardinality
columns (reference ``images/fluentbit/compact_columns.c:332-418``; ZSTD
chosen at ``:399-402``). Spark has no Arrow IPC file source, so:

- **read**: ``binaryFile`` source → ``mapInArrow`` decode with pyarrow.
  Distributed (each file decodes on an executor), Arrow-native end to
  end (no pandas hop), and handles dictionary+ZSTD bodies that even
  DuckDB's nanoarrow extension cannot (reference ``test.sh:10-13``).
  For 100 TB the unit of parallelism is the file — the ingest layer
  bounds file sizes (~1 MB-class micro-batches), so scans stay even.
- **write**: executor-side pyarrow Feather-v2 writer via
  ``applyInPandas`` per partition directory, preserving the reference's
  storage contract: Timestamp(ns), int8 dictionary for stream/logtag,
  ZSTD bodies.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.ipc as ipc

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DICT_COLUMNS = ("stream", "logtag")


# ---------------------------------------------------------------------- read


def _normalized_arrow_schema(schema: pa.Schema) -> pa.Schema:
    """Schema as the reader will surface it: dictionary→value type,
    ns-timestamp→int64. Used to detect heterogeneous files early."""
    fields = []
    for f in schema:
        typ = f.type
        if pa.types.is_dictionary(typ):
            typ = typ.value_type
        if pa.types.is_timestamp(typ) and typ.unit == "ns":
            typ = pa.int64()
        fields.append(pa.field(f.name, typ))
    return pa.schema(fields)


def _decode_schema(schema: pa.Schema, with_filename: bool) -> T.StructType:
    """Spark schema for an IPC file schema (ns timestamps → long)."""
    fields = []
    for f in schema:
        typ = f.type
        if pa.types.is_dictionary(typ):
            typ = typ.value_type
        if pa.types.is_timestamp(typ) and typ.unit == "ns":
            spark_t: T.DataType = T.LongType()
        else:
            spark_t = T.StructType.fromDDL(f"x {_arrow_to_ddl(typ)}")[0].dataType
        fields.append(T.StructField(f.name, spark_t, True))
    if with_filename:
        fields.append(T.StructField("_file", T.StringType(), False))
    return T.StructType(fields)


def _arrow_to_ddl(typ: pa.DataType) -> str:
    mapping = {
        pa.string(): "string",
        pa.large_string(): "string",
        pa.int8(): "tinyint",
        pa.int16(): "smallint",
        pa.int32(): "int",
        pa.int64(): "bigint",
        pa.float32(): "float",
        pa.float64(): "double",
        pa.bool_(): "boolean",
        pa.binary(): "binary",
    }
    if typ in mapping:
        return mapping[typ]
    if pa.types.is_timestamp(typ):
        return "timestamp_ntz"
    raise TypeError(f"unsupported arrow type in IPC source: {typ}")


def _normalize_batch(table: pa.Table, fname: str, with_filename: bool) -> pa.Table:
    """Dictionary→plain decode; ns-timestamp→int64; optional filename."""
    cols = []
    for name in table.column_names:
        col = table.column(name)
        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        if pa.types.is_timestamp(col.type) and col.type.unit == "ns":
            col = col.cast(pa.int64())
        cols.append(col)
    out = pa.table(dict(zip(table.column_names, cols)))
    if with_filename:
        out = out.append_column("_file", pa.array([fname] * len(out), pa.string()))
    return out


def read_arrow(
    spark: SparkSession, path_glob: str, with_filename: bool = True
) -> DataFrame:
    """Read Arrow IPC files matching a glob as a DataFrame.

    The Spark analog of DuckDB's ``read_arrow(glob, filename=true)``
    (reference ``y-logcli:210-213``). File bytes travel through
    ``binaryFile``'s ``content`` column and decode executor-side from
    ``pa.BufferReader`` inside ``mapInArrow`` — no local-path
    assumption, so the same plan runs on any Hadoop filesystem
    (``s3a://``, ``abfs://``, local), matching the reference's S3-glob
    reads. Decode scales with the number of files, not driver memory;
    the ingest layer bounds file sizes (~1 MB-class micro-batches).
    """
    reader = spark.read.format("binaryFile").option("pathGlobFilter", "*.arrow")
    if any(ch in path_glob for ch in "*?["):
        files_df = reader.load(path_glob).select("path", "content")
    else:  # plain directory → recurse (Hadoop globs have no `**`)
        files_df = (
            reader.option("recursiveFileLookup", "true")
            .load(path_glob)
            .select("path", "content")
        )
    # driver-side schema probe: one file's bytes (micro-batch-sized)
    sample = files_df.limit(1).collect()
    if not sample:
        raise FileNotFoundError(f"no .arrow files match {path_glob}")
    probe = ipc.open_file(pa.BufferReader(sample[0].content)).schema
    schema = _decode_schema(probe, with_filename)
    expect_norm = _normalized_arrow_schema(probe)

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            for fname_raw, buf in zip(paths, contents):
                try:
                    rd = ipc.open_file(pa.BufferReader(buf))
                except pa.ArrowInvalid as exc:
                    raise ValueError(
                        f"{fname_raw} is not an Arrow IPC file: {exc}"
                    ) from exc
                got_norm = _normalized_arrow_schema(rd.schema)
                if got_norm != expect_norm:
                    raise ValueError(
                        f"heterogeneous Arrow IPC schema in {fname_raw}: "
                        f"expected {expect_norm}, got {got_norm}"
                    )
                table = rd.read_all()
                for out in _normalize_batch(table, fname_raw, with_filename).to_batches():
                    yield out

    return files_df.mapInArrow(decode, schema)


# --------------------------------------------------------------------- write


def _resolve_fs(dest: str):
    """``(pyarrow.fs.FileSystem, path)`` for a destination URI.

    Runs executor-side (inside ``applyInArrow`` workers, where no JVM —
    hence no Hadoop FileSystem API — is reachable), so the sink resolves
    the filesystem from the URI with ``pyarrow.fs``: ``s3a://``/
    ``s3n://`` (the Hadoop S3 connector schemes the reference's lake
    uses, ``fluent-bit.conf:32-45``) map onto pyarrow's S3FileSystem;
    ``file://`` and scheme-less paths resolve to the local filesystem.
    This is the write-side mirror of the reader's ``binaryFile`` +
    ``BufferReader`` object-store path.
    """
    from pyarrow import fs as pafs

    uri = _normalize_uri(dest)
    if "://" not in uri:
        return pafs.LocalFileSystem(), uri
    return _fs_from_uri(uri)


def _fs_from_uri(uri: str):
    """Thin seam over ``pyarrow.fs.FileSystem.from_uri`` (a C-extension
    static that cannot be monkeypatched directly)."""
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(uri)


def _normalize_uri(dest: str) -> str:
    """Scheme normalization only (separable from filesystem
    construction so the routing rule is testable in builds where
    pyarrow lacks the S3 filesystem): the Hadoop connector schemes
    s3a/s3n become the s3 scheme pyarrow's from_uri understands."""
    if dest.startswith(("s3a://", "s3n://")):
        return "s3://" + dest.split("://", 1)[1]
    return dest


def _to_arrow_compact(table: pa.Table) -> pa.Table:
    """Apply the reference's column compaction to an Arrow table:
    int8-dictionary-encode the 2-3-value columns (reference
    ``compact_columns.c:193-239,245-330`` — int8 indices save 3 B/row
    over int32) and carry ns timestamps natively."""
    cols = {}
    for name in table.column_names:
        col = table.column(name)
        if name in DICT_COLUMNS and pa.types.is_string(col.type):
            combined = col.combine_chunks()
            if isinstance(combined, pa.ChunkedArray):
                combined = combined.chunk(0) if combined.num_chunks else pa.array([], col.type)
            dict_arr = combined.dictionary_encode()
            idx = dict_arr.indices.cast(pa.int8())
            col = pa.DictionaryArray.from_arrays(idx, dict_arr.dictionary)
        cols[name] = col
    return pa.table(cols)


def write_arrow_file(table: pa.Table, dest: str) -> None:
    """One Feather-v2 file: ZSTD bodies + compacted columns — the same
    storage contract the reference's writer produces. ``dest`` may be a
    local path or any ``pyarrow.fs``-resolvable URI (``file://``,
    ``s3://``/``s3a://``) — writes go through the filesystem's output
    stream, never ``os`` local-path calls."""
    filesystem, path = _resolve_fs(dest)
    if "/" in path:
        filesystem.create_dir(path.rsplit("/", 1)[0], recursive=True)
    with filesystem.open_output_stream(path) as sink:
        feather.write_feather(_to_arrow_compact(table), sink, compression="zstd")


def write_arrow_partitioned(
    df: DataFrame,
    root: str,
    partition_cols: list[str],
    time_ns_col: str = "time_ns",
) -> None:
    """Partitioned Arrow IPC sink (hive-style directories, like the
    parquet side of the lake).

    Runs as ``applyInArrow`` over the partition key so each partition's
    file is written where its data lives — no driver collection and no
    pandas hop (a pandas round-trip would coerce nullable int64 ns
    values to float64, corrupting them). The µs ``time`` column is
    dropped on write (storage keeps the ns long as ``time_ns``,
    mirroring the reference's single Timestamp(ns) column; readers
    re-derive µs).
    """
    value_cols = [c for c in df.columns if c not in partition_cols and c != "time"]

    def write_group(key: tuple, table: pa.Table) -> pa.Table:
        rel = "/".join(f"{c}={v}" for c, v in zip(partition_cols, key))
        dest = f"{root.rstrip('/')}/{rel}/{uuid.uuid4().hex}.arrow"
        write_arrow_file(table.select(value_cols), dest)
        return pa.table({"path": [dest], "rows": [len(table)]})

    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("rows", T.LongType()),
        ]
    )
    # The action drives the distributed write; results are tiny (one row
    # per partition dir).
    df.groupBy(*partition_cols).applyInArrow(write_group, out_schema).collect()
