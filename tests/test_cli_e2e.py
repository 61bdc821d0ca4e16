"""End-to-end CLI golden test over a reference-layout positional tree.

Every piece (selector parsing, positional glob pruning, path-derived
dims, ns-exact global ordering, --since predicate, the four output
modes, the plan echo) is unit-tested individually; this suite drives the
composed path through ``cli.main()`` on a multi-partition lake laid out
exactly like the reference writer produces
(``/<cluster>/<ns>/YYYY/MM/DD/<node>/<pod>/<container>/HH/MM/*.parquet``,
fluent-bit.conf path template; y-logcli:104-123 prunes it manually) and
asserts golden stdout, including ns-precise ISO timestamps.
"""

from __future__ import annotations

import time

import pytest

from kubernetes_logs_datalake_spark.cli import main

# epoch ns anchors inside 2024-01-15T10:30 UTC (matching the HH/MM path
# components below, like the reference writer's layout does)
A1 = 1705314645123456789  # 2024-01-15T10:30:45.123456789Z
B1 = 1705314645123456790  # same microsecond as A1, +1 ns — order tiebreak
A2 = 1705314646000000001  # 2024-01-15T10:30:46.000000001Z


def _write_positional(root, cluster, ns, node, pod, container, hh, mm, rows):
    """One reference-layout parquet file: rows = [(ns_epoch, message)]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dest = root / cluster / ns / "2024" / "01" / "15" / node / pod / container / hh / mm
    dest.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {
            "time": pa.array([t for t, _ in rows], pa.timestamp("ns")),
            "stream": pa.array(["stdout"] * len(rows)),
            "logtag": pa.array(["F"] * len(rows)),
            "message": pa.array([m for _, m in rows]),
        }
    )
    pq.write_table(table, str(dest / "0001.parquet"))


@pytest.fixture(scope="module")
def lake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_lake") / "lake"
    # qa rows interleave ACROSS pods at ns granularity (B1 = A1 + 1 ns
    # from a different pod) to prove the global time_ns-tiebroken sort
    _write_positional(root, "dev", "qa", "n1", "pod-a", "app", "10", "30",
                      [(A1, "qa a1"), (A2, "qa a2")])
    _write_positional(root, "dev", "qa", "n2", "pod-b", "app", "10", "30",
                      [(B1, "qa b1")])
    # pruned by the namespace selector
    _write_positional(root, "dev", "prod", "n1", "pod-c", "web", "10", "30",
                      [(A1, "prod c1")])
    # pruned by --context (cluster path position)
    _write_positional(root, "stage", "qa", "n3", "pod-d", "app", "10", "30",
                      [(A1, "stage d1")])
    # --since fixture: one stale row + one recent row in its own namespace
    now_ns = int(time.time() - 30) * 1_000_000_000 + 987_654_321
    _write_positional(root, "dev", "live", "n1", "pod-e", "app", "10", "30",
                      [(A1, "live old"), (now_ns, "live new")])
    return root


def _run(capsys, *argv) -> tuple[int, list[str]]:
    rc = main(list(argv))
    return rc, capsys.readouterr().out.splitlines()


def test_columns_mode_golden_ns_iso(spark, lake_root, capsys):
    """-o columns: ns-precise ISO timestamps, path-derived dims, global
    time order across pods (B1 sorts between A1 and A2 by its +1 ns)."""
    rc, out = _run(
        capsys, "--context=dev", f"--root={lake_root}", "query",
        '{namespace="qa"}', "-f", "parquet", "--layout=positional",
        "-o", "columns",
    )
    assert rc == 0
    assert out == [
        "2024-01-15T10:30:45.123456789Z pod-a app stdout qa a1",
        "2024-01-15T10:30:45.123456790Z pod-b app stdout qa b1",
        "2024-01-15T10:30:46.000000001Z pod-a app stdout qa a2",
    ]


def test_raw_mode_and_pod_selector(spark, lake_root, capsys):
    rc, out = _run(
        capsys, "--context=dev", f"--root={lake_root}", "query",
        '{namespace="qa"}', "-f", "parquet", "--layout=positional", "-o", "raw",
    )
    assert rc == 0
    assert out == ["qa a1", "qa b1", "qa a2"]

    rc, out = _run(
        capsys, "--context=dev", f"--root={lake_root}", "query",
        '{namespace="qa",pod="pod-a"}', "-f", "parquet",
        "--layout=positional", "-o", "raw",
    )
    assert rc == 0
    assert out == ["qa a1", "qa a2"]


def test_lines_mode_golden_blocks(spark, lake_root, capsys):
    """-o lines: blank-line-separated `key = value` blocks over the full
    column list, DuckDB `.mode line` style (y-logcli:221-227)."""
    rc, out = _run(
        capsys, "--context=dev", f"--root={lake_root}", "query",
        '{namespace="qa",pod="pod-b"}', "-f", "parquet",
        "--layout=positional", "-o", "lines",
    )
    assert rc == 0
    assert out == [
        "  cluster = dev",
        "namespace = qa",
        "     node = n2",
        "      pod = pod-b",
        "container = app",
        "     time = 2024-01-15 10:30:45.123456",
        "   stream = stdout",
        "   logtag = F",
        "  message = qa b1",
    ]


def test_table_mode_schema_prepass_and_explain(spark, lake_root, capsys):
    """-o table prints the schema comment pre-pass then the boxed table;
    --explain echoes the executed Catalyst plan after results."""
    rc, out = _run(
        capsys, "--context=dev", f"--root={lake_root}", "query",
        '{namespace="qa"}', "-f", "parquet", "--layout=positional",
        "-o", "table", "--explain",
    )
    assert rc == 0
    text = "\n".join(out)
    for decl in ("-- cluster: string", "-- message: string", "-- time: timestamp_ntz"):
        assert decl in text
    assert "qa a1" in text and "pod-b" in text
    assert "-- plan executed:" in text
    assert "Physical Plan" in text or "Exchange" in text or "Scan" in text


def test_since_filters_old_rows(spark, lake_root, capsys):
    """--since=1h keeps only the row written ~30s ago; the 2024 row in
    the same namespace is filtered by the pushed-down time predicate."""
    rc, out = _run(
        capsys, "--context=dev", f"--root={lake_root}", "query",
        '{namespace="live"}', "-f", "parquet", "--layout=positional",
        "-o", "raw", "--since=1h",
    )
    assert rc == 0
    assert out == ["live new"]


def test_native_lake_ingest_to_cli_roundtrip(spark, tmp_path, capsys):
    """Full lifecycle on OUR writer's native hive layout: CRI lines →
    parse → partitioned lake write → cli query with selector + output
    mode. The positional tests above cover reading the REFERENCE
    writer's layout; this covers the engine's own write→read loop."""
    from kubernetes_logs_datalake_spark.sources import parse_cri_lines
    from kubernetes_logs_datalake_spark.sources.logs import LogLake

    raw = spark.createDataFrame(
        [
            ("/var/log/pods/qa_pod-a_u1/app/0.log",
             "2024-01-15T10:30:45.123456789Z stdout F native a1"),
            ("/var/log/pods/qa_pod-a_u1/app/0.log",
             "2024-01-15T10:30:46.000000001Z stdout F native a2"),
            ("/var/log/pods/prod_pod-b_u2/web/0.log",
             "2024-01-15T10:30:45.5Z stderr F native b1"),
        ],
        ["path", "value"],
    )
    lake = LogLake(str(tmp_path / "native_lake"))
    lake.write_batch(parse_cri_lines(raw, path_col="path", cluster="dev"))

    rc, out = _run(
        capsys, "--context=dev", f"--root={lake.root}", "query",
        '{namespace="qa"}', "-f", "parquet", "-o", "columns",
    )
    assert rc == 0
    assert out == [
        "2024-01-15T10:30:45.123456789Z pod-a app stdout native a1",
        "2024-01-15T10:30:46.000000001Z pod-a app stdout native a2",
    ]

    rc, out = _run(
        capsys, "--context=dev", f"--root={lake.root}", "query",
        '{container="web"}', "-f", "parquet", "-o", "raw",
    )
    assert rc == 0
    assert out == ["native b1"]


def test_bad_selector_and_bad_root_exit_2(spark, lake_root, capsys):
    rc = main([
        "--context=dev", f"--root={lake_root}", "query", "not a selector",
    ])
    assert rc == 2
    rc = main([
        "--context=dev", "--root=/nonexistent/lake/root", "query",
        '{namespace="qa"}', "-f", "parquet", "--layout=positional",
    ])
    assert rc == 2
