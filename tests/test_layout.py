"""Z-order layout tests: key semantics and the data-skipping property
the layout exists for (per-file footer stats become tight in EVERY
participating dimension, not just the leading sort column)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_zorder_key_interleaves_bits(spark):
    """Morton layout: bit i of col j lands at position i*k + j."""
    from kubernetes_logs_datalake_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(zorder_key(["x", "y"], bits=3).alias("z")).collect()[0].z
    # x bits (1,0,1) at even positions, y bits (1,1,0) at odd:
    # pos0=x0=1, pos1=y0=1, pos2=x1=0, pos3=y1=1, pos4=x2=1, pos5=y2=0
    # → reading bit 5..0: 0,1,1,0,1,1
    assert z == 0b011011


def test_zorder_key_locality(spark):
    """Points close in both dimensions get closer keys than points far
    in one dimension — the property that makes range-partitioned files
    cover compact 2-D regions."""
    from kubernetes_logs_datalake_spark.operators.layout import zorder_key

    rows = [(10, 10), (11, 11), (10, 1000)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = [r.z for r in df.select(zorder_key(["x", "y"], 12).alias("z")).collect()]
    assert abs(z[0] - z[1]) < abs(z[0] - z[2])


def test_write_zordered_tightens_both_dims(spark, tmp_path):
    """On a 64x64 grid, Z-order files have narrow min-max ranges in
    BOTH columns; a linear sort leaves the second column full-width —
    the footer stats a pruning scan consults."""
    from kubernetes_logs_datalake_spark.operators.layout import (
        file_stat_ranges,
        write_zordered,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zdir = str(tmp_path / "zorder")
    write_zordered(grid, ["x", "y"], zdir, bits=6, num_files=16)

    ldir = str(tmp_path / "linear")
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    def mean_width(path, col):
        rngs = file_stat_ranges(path, col)
        assert rngs, f"no stats under {path}"
        return sum(hi - lo for lo, hi in rngs) / len(rngs)

    # z-order: both dims tight (each file ~ a 16x16 quadrant)
    assert mean_width(zdir, "x") <= 24
    assert mean_width(zdir, "y") <= 24
    # linear: y is full-width (~63), so pruning on y is impossible
    assert mean_width(ldir, "y") >= 48
    assert mean_width(zdir, "y") < mean_width(ldir, "y") / 2
