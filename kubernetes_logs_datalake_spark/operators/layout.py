"""Data-layout optimization: Z-order (Morton) clustering for
multi-column data skipping.

Parquet scan pruning works off per-file / per-row-group min-max stats;
sorting by one column makes its stats tight but leaves every other
column's ranges full-width. Interleaving the bits of several columns
into one Morton key and range-partitioning + sorting by it gives every
participating column locally-narrow ranges — the standard lakehouse
OPTIMIZE ZORDER BY. At 100 TB this is the difference between scanning
a full partition and skipping all but a few files for a 2-D predicate.

Everything is plain integer column math (shift/mask/or) — codegen'd,
shuffle only for the final range partitioning, and expressible 1:1 in
ANSI SQL so the key function is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of each column
    (callers quantize to non-negative ints first — e.g. rank, bucket id,
    or truncated value). With ``k`` columns the result uses k·bits bits:
    bit ``i`` of column ``j`` lands at position ``i·k + j``.

    Pure shift/and/or long math — one codegen'd expression, no shuffle.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(ncols)
    acc: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(ncols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(F.shiftleft(bit, i * k + j))
    return acc


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the Morton key (each output file owns one
    contiguous key range — this is what makes per-FILE stats tight,
    not just per-row-group), sort within partitions, drop the key.

    The range exchange is the one shuffle; its sampled bounds keep the
    files size-balanced even when the key space is skewed.
    """
    from kubernetes_logs_datalake_spark.session import shuffle_partitions

    z = zorder_key(cols, bits).alias("_z")
    out = df.withColumn("_z", z)
    nparts = num_files or shuffle_partitions(df.sparkSession)
    (
        out.repartitionByRange(nparts, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stat_ranges(path: str, column: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of ``column`` from parquet footer stats —
    the numbers a pruning scan consults. Test/inspection helper."""
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def export_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    n_shards: int = 16,
) -> None:
    """Export a curated corpus as ``n_shards`` training shards with a
    deterministic global pseudo-shuffle — the final step before a
    tokenizer/training job consumes the data. Every row lands in shard
    ``xxhash64(id) mod n_shards`` and shards are internally ordered by
    ``md5(id)``, so (a) the shard assignment and intra-shard order are
    identical on any cluster size/partitioning (re-exports are
    byte-stable), (b) adjacent source rows scatter across shards — the
    training-time "shuffled corpus" property — and (c) any single shard
    is a valid uniform 1/n sample of the corpus.

    Plan: one hash repartition into exactly ``n_shards`` tasks, an
    intra-partition sort (never global), one file per shard directory
    (`shard=NNN/`). At 100 TB raise ``n_shards`` until shards fit the
    downstream reader's memory — the shape is unchanged.
    """
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(F.col("shard"), F.md5(F.col(id_col).cast("string")))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def compute_range_bounds(
    df: DataFrame,
    key_col: str,
    n_buckets: int,
    sample_prefix_lt: str = "04",
) -> list:
    """Range-partitioner boundaries from a deterministic hash sample —
    the Spark RangePartitioner recipe (sample, sort the sample, pick
    evenly-spaced order statistics), made reproducible: the sample is
    ``md5(key) < prefix`` (lexicographic hex compare, the repo's
    portable-sampling idiom) instead of a seeded RNG, so every engine
    and every rerun derives the identical boundaries.

    Returns the boundary values: sorted sample s₁..sₘ, boundary_j = s
    at rank (j·m) div n_buckets, j = 1..n-1, deduplicated by VALUE —
    two rank targets landing on equal sample keys yield one boundary
    (a duplicated boundary would only manufacture an empty bucket).
    Raises when the sample is smaller than ``n_buckets``: with m < n
    the rank targets collide/vanish and the boundaries are garbage —
    widen ``sample_prefix_lt`` instead. Only the sample — corpus/rate
    rows — is ever globally sorted; the full table is untouched,
    exactly like the native partitioner.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from pyspark.sql import Window

    sample = df.select(F.col(key_col).alias("_k")).filter(
        F.md5(F.col(key_col).cast("string")) < F.lit(sample_prefix_lt)
    )
    ranked = sample.select(
        "_k",
        F.row_number().over(Window.orderBy("_k")).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_m"),
    )
    bounds = ranked.filter(
        F.expr(
            f"exists(sequence(1, {n_buckets - 1}),"
            f" j -> _rn = CAST(j * _m DIV {n_buckets} AS INT))"
        )
    )
    rows = bounds.orderBy("_rn").collect()
    # m >= n_buckets guarantees rank target m div n_buckets >= 1 exists,
    # so an empty bounds list can only mean an undersized sample
    m = rows[0]._m if rows else sample.count()
    if m < n_buckets:
        raise ValueError(
            f"sample has {m} rows for {n_buckets} buckets; boundaries "
            f"would be degenerate — widen sample_prefix_lt"
        )
    return list(dict.fromkeys(r._k for r in rows))


def range_partition_audit(
    df: DataFrame,
    key_col: str,
    n_buckets: int,
    sample_prefix_lt: str = "04",
) -> DataFrame:
    """Partition-balance audit for sample-derived range boundaries:
    assign every row its bucket and report (bucket, n_rows, min_key,
    max_key) — the skew report you read BEFORE committing a sort key
    for a 100 TB range-partitioned write.

    Bucket assignment is a packed-literal fold over the broadcast
    boundary array (bucket = Σ [key > boundary_j]) — map-only, one
    codegen'd expression per row, no join and no shuffle beyond the
    n_buckets-row final agg. Rows with NULL keys are excluded (a range
    partitioner would route them to a dedicated bucket; the audit
    reports real key ranges).
    """
    bounds = compute_range_bounds(df, key_col, n_buckets, sample_prefix_lt)
    arr = F.array(*[F.lit(b) for b in bounds])
    bucket = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(key_col) > b, 1).otherwise(0),
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(key_col).alias("min_key"),
            F.max(key_col).alias("max_key"),
        )
        .orderBy("bucket")
    )


def export_manifest(spark, path: str) -> DataFrame:
    """Content-hash manifest of an exported shard tree: one row per
    data file — (path, n_rows, n_bytes, sha256) — plus the fact that
    re-hashing a byte-stable re-export reproduces it exactly, which is
    what makes a training run reproducible ("which bytes did we train
    on?") and a transfer verifiable end-to-end.

    Distributed end to end: the sha256 leg is a binaryFile scan with
    ``sha2`` in codegen (each file hashed where it lives — no bytes
    move to the driver), the row-count leg is a parquet scan grouped by
    ``input_file_name`` (column-pruned to zero columns, so it reads
    footers + row-group headers, not data pages). At 100 TB both legs
    are embarrassingly parallel over files; raise
    ``spark.sql.files.maxPartitionBytes`` awareness: binaryFile loads
    a file per row, so shard size (export_training_shards' n_shards
    knob) is what bounds executor memory here.
    """
    from pyspark.sql import functions as F

    # binaryFile reports file:/x, input_file_name file:///x — normalize
    # both to a bare path before the join
    def norm(c):
        return F.regexp_replace(c, "^file:/+", "/")

    glob = path.rstrip("/") + "/*/*.parquet"
    hashes = (
        spark.read.format("binaryFile")
        .load(glob)
        .select(
            norm(F.col("path")).alias("path"),
            F.col("length").alias("n_bytes"),
            F.sha2(F.col("content"), 256).alias("sha256"),
        )
    )
    rows = (
        spark.read.parquet(path)
        .select(norm(F.input_file_name()).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # a hashed file the parquet leg never counted means the two
    # listings diverged (path-normalization drift, a non-shard layout,
    # or a zero-row file no exporter here writes) — a silent n_rows=0
    # would be a plausible-looking but wrong manifest, so fail loudly
    n_rows = F.when(
        F.col("n_rows").isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    "export_manifest: file hashed but absent from the "
                    "parquet row-count scan (listing mismatch): "
                ),
                F.col("path"),
            )
        ).cast("long"),
    ).otherwise(F.col("n_rows"))
    return (
        hashes.join(rows, "path", "left")
        .select(
            "path",
            n_rows.alias("n_rows"),
            "n_bytes",
            "sha256",
        )
        .orderBy("path")
    )
