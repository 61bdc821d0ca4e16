"""Tests: round-5 operators — hopping-window rollup, passage chunking,
corpus boilerplate n-grams, MinHash calibration, ANN recall eval."""

from __future__ import annotations

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.dedup import (
    minhash_calibration,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from kubernetes_logs_datalake_spark.operators.rollup import hopping_rollup
from kubernetes_logs_datalake_spark.operators.sampling import chunk_passages
from kubernetes_logs_datalake_spark.operators.textstats import common_ngrams

US = 1_000_000


def test_hopping_rollup_window_membership(spark):
    # window 10 s, slide 5 s: event at t lands in exactly the windows
    # [start, start+10s) with start ∈ {5s·i}; base far from epoch so the
    # t-window>0 floor-division fast path is the one exercised
    base = 1_700_000_000 * US
    rows = [
        (1, base + 0),          # windows starting at base-5s and base
        (2, base + 4 * US),     # same two windows
        (3, base + 5 * US),     # windows base and base+5s
        (4, base + 12 * US),    # windows base+5s and base+10s
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_us long").select(
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts")
    )
    out = hopping_rollup(
        df, ts_col="ts", window_us=10 * US, slide_us=5 * US,
        aggs=[F.count("*").alias("n")],
    )
    got = {r.window_start_us: r.n for r in out.collect()}
    assert got == {
        base - 5 * US: 2,   # events 1, 2
        base: 3,            # events 1, 2, 3
        base + 5 * US: 2,   # events 3, 4
        base + 10 * US: 1,  # event 4
    }
    # every event appears in exactly window/slide = 2 windows
    assert sum(got.values()) == 2 * len(rows)


def test_hopping_rollup_boundary_exclusive(spark):
    # an event exactly on a window end (t = start + window) is NOT in
    # that window but IS the first event of the window starting at t
    t = 1_700_000_000 * US
    df = spark.createDataFrame([(1, t)], "event_id long, ts_us long").select(
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts")
    )
    out = hopping_rollup(df, ts_col="ts", window_us=10 * US, slide_us=5 * US)
    starts = sorted(r.window_start_us for r in out.collect())
    assert starts == [t - 5 * US, t]


def test_hopping_rollup_rejects_non_multiple():
    import pytest

    with pytest.raises(ValueError):
        hopping_rollup(None, window_us=7, slide_us=3)


def test_chunk_passages_boundaries(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    out = chunk_passages(df, "doc_id", "text", size=10, overlap=2)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    d1 = [r for r in rows if r.doc_id == 1]
    # stride 8: chunks at 0, 8, …, 96 → 13 chunks; last has 4 words
    assert len(d1) == 13
    assert d1[0].chunk_text.split() == [f"w{i}" for i in range(10)]
    assert d1[1].start_word == 8
    assert d1[-1].start_word == 96 and d1[-1].n_words == 4
    # consecutive chunks share exactly `overlap` words
    assert d1[0].chunk_text.split()[-2:] == d1[1].chunk_text.split()[:2]
    # short doc → one whole-doc chunk; empty doc → no chunks
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_words == 3
    assert not [r for r in rows if r.doc_id == 3]


def test_common_ngrams_ranking(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown cat sleeps"),
            (3, "the quick brown cat purrs"),
            (4, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    out = common_ngrams(df, "doc_id", "text", n=3, min_df=2, k=10).collect()
    by_gram = {r.ngram: r.doc_freq for r in out}
    assert by_gram["the quick brown"] == 3
    assert by_gram["quick brown cat"] == 2
    # min_df excludes singletons entirely
    assert all(v >= 2 for v in by_gram.values())
    # ordering: doc_freq desc, gram asc
    assert [r.ngram for r in out][0] == "the quick brown"


def test_minhash_calibration_matches_exact_jaccard(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 1
        (3, "completely different tokens nothing shared here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = minhash_calibration(
        df, "doc_id", "text", num_hashes=64, bands=16, n=1, hash_family="portable"
    ).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs  # the planted near-dup must be a candidate
    r = pairs[(1, 2)]
    # exact Jaccard of the two 8-word sets: |∩|=7, |∪|=9 (scale-6 rounding)
    assert abs(r.jaccard - 7 / 9) < 1e-6
    # estimator/report invariants on every pair
    for p in out:
        assert 0.0 <= p.est_jaccard <= 1.0
        assert 0.0 <= p.jaccard <= 1.0
        assert abs(p.abs_err - abs(p.est_jaccard - p.jaccard)) < 1e-6
    # calibration's candidate set IS the LSH candidate set (same params)
    cands = minhash_lsh_candidates(
        df, "doc_id", "text", num_hashes=64, bands=16, n=1, hash_family="portable"
    ).collect()
    assert {(r.id_a, r.id_b) for r in cands} == set(pairs)
    # and its exact column agrees with the inverted-index Jaccard op
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.0).collect()
    }
    for (a, b), row in pairs.items():
        if (a, b) in exact:
            assert abs(exact[(a, b)] - row.jaccard) < 1e-6


def test_hopping_counts_batch_stream_and_rollup_agree(spark, tmp_path):
    """Three paths, one answer: native-sliding-window batch, the same
    plan over a file stream (complete mode), and the exact-integer
    hopping_rollup — all must produce identical (window_start, n)."""
    from kubernetes_logs_datalake_spark.sources.cri import parse_cri_lines
    from kubernetes_logs_datalake_spark.streaming.analytics import hopping_counts

    data_dir = tmp_path / "in"
    data_dir.mkdir()
    lines = [
        f"2024-01-15T10:{30 + (i // 30):02d}:{i % 30:02d}.0Z stdout F m{i}"
        for i in range(90)
    ]
    (data_dir / "a.log").write_text("\n".join(lines) + "\n")

    def records_of(df):
        return parse_cri_lines(
            df.withColumn("path", F.input_file_name()), path_col=None, cluster="dev"
        )

    batch = records_of(spark.read.text(str(data_dir)))
    got_batch = {
        (str(r.window_start), r.n)
        for r in hopping_counts(batch, window="1 minute", slide="30 seconds").collect()
    }
    # 90 events over 10:30:00-10:32:29; each 1-min window sliding 30 s
    assert ("2024-01-15 10:30:00", 30) in got_batch
    assert ("2024-01-15 10:30:30", 30) in got_batch  # straddles 30:30-31:29

    # exact-integer batch form agrees (window_start_us → same instants)
    rolled = hopping_rollup(
        batch, ts_col="time", window_us=60 * US, slide_us=30 * US,
        aggs=[F.count("*").alias("n")],
    )
    import datetime as dt

    got_rolled = {
        (
            dt.datetime.fromtimestamp(
                r.window_start_us / US, dt.timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S"),
            r.n,
        )
        for r in rolled.collect()
    }
    assert got_rolled == got_batch

    stream = records_of(spark.readStream.format("text").load(str(data_dir)))
    q = (
        hopping_counts(stream, window="1 minute", slide="30 seconds",
                       watermark_delay="1 minute")
        .writeStream.format("memory")
        .queryName("hop_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got_stream = {
            (str(r.window_start), r.n)
            for r in spark.sql("SELECT * FROM hop_counts").collect()
        }
        assert got_stream == got_batch
    finally:
        q.stop()


# ------------------------------------------------------------ semdedup


def _vec_rows():
    # two tight groups far apart (so k=2 k-means separates them) plus
    # one outlier-ish member per group to control the keep verdict
    return [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),     # near-dup of 1
        (3, [0.85, 0.45, 0.0, 0.0]),      # same cell, cos<0.95 to both 1 and 2
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.999, 0.01]),    # near-dup of 10
        (20, [0.0, 1.0, 0.0, 0.0]),       # same-ish cell as 1/2/3, not a dup
    ]


def test_semdedup_one_keep_per_component(spark):
    from kubernetes_logs_datalake_spark.operators.semdedup import semdedup

    df = spark.createDataFrame(
        _vec_rows(), "vec_id long, embedding array<float>"
    )
    out = semdedup(df, "vec_id", "embedding", k=2, iters=2, threshold=0.95)
    rows = {r.vec_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 10, 11, 20}
    # exactly one keep per component
    by_comp = {}
    for r in rows.values():
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        assert sum(m.keep for m in members) == 1, (comp, members)
    # the two near-dup pairs share a component; the keep is the member
    # farthest from its centroid (ties impossible here)
    assert rows[1].component == rows[2].component
    assert rows[10].component == rows[11].component
    # non-duplicated rows are singleton keeps
    assert rows[20].keep and rows[3].keep
    kept_ab = {m.vec_id for m in by_comp[rows[1].component] if m.keep}
    drop_ab = {m.vec_id for m in by_comp[rows[1].component] if not m.keep}
    assert len(kept_ab) == 1 and kept_ab | drop_ab == {1, 2}


def test_semdedup_max_cluster_guard(spark):
    import pytest as _pytest

    from kubernetes_logs_datalake_spark.operators.semdedup import semdedup

    df = spark.createDataFrame(
        _vec_rows(), "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="max_cluster"):
        semdedup(df, "vec_id", "embedding", k=1, iters=1, max_cluster=2)


def test_semdedup_pairs_stay_within_cluster(spark):
    from kubernetes_logs_datalake_spark.operators.semdedup import semdedup_pairs
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_fit

    df = spark.createDataFrame(
        _vec_rows(), "vec_id long, embedding array<float>"
    )
    _, assigned = kmeans_fit(df, "vec_id", "embedding", k=2, iters=2)
    pairs = semdedup_pairs(assigned, "vec_id", "embedding", threshold=-1.0)
    clus = {r.vec_id: r.cluster for r in assigned.collect()}
    got = pairs.collect()
    assert got, "threshold=-1 must emit every intra-cell pair"
    for r in got:
        assert clus[r.id_a] == clus[r.id_b] == r.cluster
        assert r.id_a < r.id_b
    # cross-cell pairs never appear even at threshold=-1
    cells = {}
    for v, c in clus.items():
        cells.setdefault(c, set()).add(v)
    n_intra = sum(len(s) * (len(s) - 1) // 2 for s in cells.values())
    assert len(got) == n_intra


# ----------------------------------------------------- containment dedup


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc quoted whole inside a long one: containment 1.0,
    Jaccard well below any dedup threshold."""
    from kubernetes_logs_datalake_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = quote + " " + " ".join(f"filler{i} word{i} extra{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id long, text string"
    )
    cont = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.cont_a == 1.0  # all of doc 1's trigrams are inside doc 2
    assert r.cont_b < 0.5
    # symmetric Jaccard misses the same pair at the same threshold
    jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert jac == []


def test_containment_max_df_guard_drops_hot_shingles(spark):
    from kubernetes_logs_datalake_spark.operators.dedup import containment_pairs

    # every doc shares one hot trigram; capping df removes it from the
    # index so unrelated docs produce no pair at all
    docs = [(i, f"alpha beta gamma unique{i} token{i} word{i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with_guard = containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.2, max_df=2
    ).collect()
    assert with_guard == []


# ------------------------------------------------------ fuzzy text join


def test_fuzzy_join_finds_snippet_source(spark):
    from kubernetes_logs_datalake_spark.operators.dedup import fuzzy_text_join

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "completely different content with other words inside"),
        ],
        "doc_id long, text string",
    )
    snips = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "snippet_id long, snippet string"
    )
    out = fuzzy_text_join(
        snips, docs, "snippet_id", "doc_id", "snippet", "text",
        n=3, threshold=0.8, metric="containment",
    ).collect()
    assert [(r.snippet_id, r.doc_id, r.score) for r in out] == [(100, 1, 1.0)]


def test_fuzzy_join_jaccard_metric_and_bad_metric(spark):
    import pytest as _pytest

    from kubernetes_logs_datalake_spark.operators.dedup import fuzzy_text_join

    a = spark.createDataFrame([(1, "alpha beta gamma delta")], "id long, t string")
    b = spark.createDataFrame([(9, "alpha beta gamma delta")], "rid long, t2 string")
    out = fuzzy_text_join(a, b, "id", "rid", "t", "t2", n=2,
                          threshold=0.99, metric="jaccard").collect()
    assert [(r.id, r.rid, r.score) for r in out] == [(1, 9, 1.0)]
    with _pytest.raises(ValueError):
        fuzzy_text_join(a, b, "id", "rid", "t", "t2", metric="cosine")


def test_fuzzy_join_max_df_drops_hot_shingles_both_sides(spark):
    from kubernetes_logs_datalake_spark.operators.dedup import fuzzy_text_join

    # the shared trigram appears in every row of both sides; with the
    # cap it leaves the index entirely -> no pairs at all
    a = spark.createDataFrame(
        [(i, f"common shared phrase plus left{i} extra{i}") for i in range(4)],
        "id long, t string",
    )
    b = spark.createDataFrame(
        [(i, f"common shared phrase plus right{i} other{i}") for i in range(4)],
        "rid long, t2 string",
    )
    got = fuzzy_text_join(a, b, "id", "rid", "t", "t2", n=3,
                          threshold=0.1, max_df=1).collect()
    assert got == []


# ------------------------------------------------------------ gap fill


def test_gapfill_rollup_densifies_and_locf(spark):
    from kubernetes_logs_datalake_spark.operators.rollup import gapfill_rollup

    HOUR_US = 3600 * US
    base = 1_700_000_000 * US - (1_700_000_000 * US) % HOUR_US
    rows = [  # key "a": hours 0, 1, 3 (hour 2 missing); key "b": hour 0 only
        (1, "a", base + 0, 10.0),
        (2, "a", base + HOUR_US + 1, 20.0),
        (3, "a", base + 3 * HOUR_US + 2, 40.0),
        (4, "b", base + 0, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts_us long, value double"
    ).select("event_id", "k", F.timestamp_micros(F.col("ts_us")).alias("ts"), "value")
    out = gapfill_rollup(
        df, ts_col="ts", every="hour", keys=["k"],
        aggs=[F.count("*").alias("n"), F.sum("value").alias("sv")],
        locf_cols=["sv"],
    )
    got = {(r.k, r.bucket_ns): r for r in out.collect()}
    a_buckets = sorted(b for (k, b) in got if k == "a")
    assert len(a_buckets) == 4  # hours 0..3 densified
    gap = got[("a", a_buckets[2])]
    assert gap.is_gap and gap.n == 0 and gap.sv is None
    assert gap.sv_locf == 20.0  # carried forward from hour 1
    assert not got[("a", a_buckets[3])].is_gap
    assert got[("a", a_buckets[3])].sv_locf == 40.0
    # key "b" has a single-bucket span: no gaps generated
    assert [k for (k, _) in got if k == "b"] == ["b"]


# ---------------------------------------------------- hybrid retrieval


def test_hybrid_rrf_fuses_both_lists(spark):
    from kubernetes_logs_datalake_spark.operators.similarity import hybrid_topk

    kw = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    vec = spark.createDataFrame(
        [(2, 0.99), (4, 0.80)], "vec_id long, cos double"
    )
    out = hybrid_topk(kw, vec, "doc_id", "vec_id", "score", "cos", k=10, c=60)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # doc 2 is in both lists (kw rank 2, vec rank 1) and must win
    assert rows[2].kw_rank == 2 and rows[2].vec_rank == 1
    top = out.first()
    assert top.doc_id == 2
    assert abs(rows[2].rrf - (1 / 62 + 1 / 61)) < 1e-6
    # single-list docs carry a NULL rank on the missing side
    assert rows[1].vec_rank is None and rows[4].kw_rank is None
    assert abs(rows[1].rrf - 1 / 61) < 1e-6


def test_hybrid_rank_ties_break_by_id(spark):
    from kubernetes_logs_datalake_spark.operators.similarity import (
        _rank_candidates,
    )

    df = spark.createDataFrame(
        [(5, 1.0), (3, 1.0), (7, 2.0)], "id long, s double"
    )
    got = {r._id: r.rank for r in _rank_candidates(df, "id", "s").collect()}
    assert got == {7: 1, 3: 2, 5: 3}


def test_gapfill_zero_fill_param_and_presence_marker(spark):
    """An all-NULL aggregate over PRESENT rows is not a gap, and
    zero_fill applies to named columns regardless of their alias."""
    from kubernetes_logs_datalake_spark.operators.rollup import gapfill_rollup

    HOUR_US = 3600 * US
    base = 1_700_000_000 * US - (1_700_000_000 * US) % HOUR_US
    rows = [(1, "a", base + 0, None), (2, "a", base + 2 * HOUR_US, 5.0)]
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts_us long, value double"
    ).select("event_id", "k", F.timestamp_micros(F.col("ts_us")).alias("ts"), "value")
    out = gapfill_rollup(
        df, ts_col="ts", every="hour", keys=["k"],
        aggs=[F.count("*").alias("cnt"), F.sum("value").alias("sv")],
        zero_fill=["cnt"],
    )
    got = sorted(out.collect(), key=lambda r: r.bucket_ns)
    # hour 0: present with all-NULL sum -> NOT a gap; cnt intact
    assert not got[0].is_gap and got[0].cnt == 1 and got[0].sv is None
    # hour 1: a real gap -> cnt zero-filled, sv NULL
    assert got[1].is_gap and got[1].cnt == 0 and got[1].sv is None
    # unknown zero_fill name raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="zero_fill"):
        gapfill_rollup(df, ts_col="ts", keys=["k"], zero_fill=["nope"])


# ------------------------------------------------------------ MMR


def test_mmr_diversifies_against_greedy_relevance(spark):
    """Three near-identical top candidates + one diverse lower-rel one:
    pure relevance picks the clones; MMR picks the diverse one second."""
    from kubernetes_logs_datalake_spark.operators.similarity import mmr_rerank

    cands = spark.createDataFrame(
        [(1, 0.99), (2, 0.98), (3, 0.97), (9, 0.80)],
        "vec_id long, cos double",
    )
    sims_rows = []
    clones = [1, 2, 3]
    for a in [1, 2, 3, 9]:
        for b in [1, 2, 3, 9]:
            if a == b:
                continue
            sim = 0.99 if a in clones and b in clones else 0.05
            sims_rows.append((a, b, sim))
    sims = spark.createDataFrame(sims_rows, "id_a long, id_b long, sim double")
    out = mmr_rerank(cands, sims, "vec_id", "cos", k=3, lam=0.7)
    order = [r.vec_id for r in out.orderBy("rank").collect()]
    assert order[0] == 1           # most relevant first
    assert order[1] == 9           # the diverse candidate jumps the clones
    assert order[2] in (2, 3)      # then the best remaining clone
    rows = {r.rank: r for r in out.collect()}
    assert abs(rows[1].mmr_score - round(0.7 * 0.99, 6)) < 1e-9
    # clone penalty: 0.7*0.98 - 0.3*0.99 < 0.7*0.80 - 0.3*0.05
    assert rows[2].mmr_score > 0.7 * 0.98 - 0.3 * 0.99


def test_mmr_handles_k_larger_than_candidates(spark):
    from kubernetes_logs_datalake_spark.operators.similarity import mmr_rerank

    cands = spark.createDataFrame([(1, 0.9), (2, 0.8)], "vec_id long, cos double")
    sims = spark.createDataFrame(
        [(1, 2, 0.1), (2, 1, 0.1)], "id_a long, id_b long, sim double"
    )
    out = mmr_rerank(cands, sims, "vec_id", "cos", k=10)
    assert [r.vec_id for r in out.orderBy("rank").collect()] == [1, 2]
