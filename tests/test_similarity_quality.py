"""Approximate-operator quality gates: the fast/approximate paths must
track the exact ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from kubernetes_logs_datalake_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_arrow,
)

SF = "/root/testdata/sf0.001"


def test_arrow_topk_matches_column_topk(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).first().embedding]
    rest = emb.filter(F.col("vec_id") != 0)
    col_rows = brute_force_topk(rest, "embedding", q, k=10).collect()
    arrow_rows = brute_force_topk_arrow(rest, "embedding", q, k=10).collect()
    assert [r.vec_id for r in col_rows] == [r.vec_id for r in arrow_rows]
    for a, b in zip(col_rows, arrow_rows):
        assert abs(a.cos - b.cos) < 1e-9


def test_ngram_jaccard_max_df_guard(spark):
    """A universal shingle must not quadratically explode the inverted-
    index join: 20 docs sharing one token produce 190 pairs uncapped,
    and zero once the document-frequency cap drops that token."""
    docs = spark.createDataFrame(
        [(i, f"common u{i}") for i in range(20)], ["doc_id", "text"]
    )
    uncapped = ngram_jaccard_pairs(docs, "doc_id", "text", n=1, threshold=0.1)
    assert uncapped.count() == 190  # 20*19/2, all via the universal token
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=1, threshold=0.1, max_df=5
    )
    assert capped.count() == 0


def test_ngram_jaccard_max_df_noop_when_loose(spark):
    """A cap above every shingle's document frequency must not change
    results — the guard is a pure prefilter."""
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    base = {
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in ngram_jaccard_pairs(d, "doc_id", "text", n=1, threshold=0.6).collect()
    }
    loose = {
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in ngram_jaccard_pairs(
            d, "doc_id", "text", n=1, threshold=0.6, max_df=10_000
        ).collect()
    }
    assert base == loose and base


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's core property: documents sharing a substring of at
    least k + window - 1 characters MUST share a fingerprint; disjoint
    documents share none; sub-k texts produce no (garbage) grams."""
    from kubernetes_logs_datalake_spark.operators.dedup import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"prefix one {shared} suffix alpha"),
            (2, f"different opening {shared} other ending"),
            (3, "completely unrelated words entirely elsewhere"),
            (4, "tiny"),  # < k after normalization → no fingerprints
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4)
    by_doc: dict[int, set] = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc.get(3, set()))
    assert 4 not in by_doc


def test_winnow_pairs_detects_long_shared_substrings(spark):
    """winnow_pairs surfaces pairs with long shared substrings that
    bag-of-word-shingle Jaccard underrates: two documents sharing a
    long verbatim passage but otherwise disjoint must score high on
    winnow Jaccard while staying a pair unigram Jaccard misses at the
    same threshold. Disjoint documents must produce no pair."""
    from kubernetes_logs_datalake_spark.operators.dedup import (
        ngram_jaccard_pairs,
        winnow_pairs,
    )

    passage = (
        "permission is hereby granted free of charge to any person "
        "obtaining a copy of this software and associated documentation"
    )
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {passage} gamma delta"),
            (2, f"epsilon zeta {passage} eta theta"),
            (3, "iota kappa lambda entirely unrelated content here"),
            (4, "mu nu xi omicron nothing in common either way"),
        ],
        ["doc_id", "text"],
    )
    wp = {(r.id_a, r.id_b): r.jaccard for r in
          winnow_pairs(docs, "doc_id", "text", k=8, window=4, threshold=0.3).collect()}
    assert (1, 2) in wp and wp[(1, 2)] > 0.5, f"shared passage not detected: {wp}"
    assert all(p == (1, 2) for p in wp), f"false pairs: {wp}"
    # the same pair under word-unigram Jaccard scores lower than winnow
    # Jaccard (shared words diluted by each doc's distinct words)
    nj = {(r.id_a, r.id_b): r.jaccard for r in
          ngram_jaccard_pairs(docs, "doc_id", "text", n=1, threshold=0.0).collect()}
    assert nj[(1, 2)] < wp[(1, 2)]


def test_lsh_recall_on_clustered_corpus(spark):
    """On a corpus with a realistic similarity distribution (planted
    near-dup pairs over noise background — the bench fixture's
    generator), the banded-LSH path at the bench parameters must
    recover ≥ 90% of brute-force pairs at cos ≥ 0.8 with no false
    positives, and the candidate volume must stay near the planted pair
    count (blocking actually blocks, unlike on the adversarial driver
    corpus)."""
    from bench import make_clustered_corpus
    from kubernetes_logs_datalake_spark.operators.dedup import embedding_dedup_pairs
    from kubernetes_logs_datalake_spark.operators.similarity import lsh_bucketed_pairs

    emb_t, _ = make_clustered_corpus(n_bg_e=300, n_pl_e=60, n_bg_d=0, n_pl_d=0)
    emb = spark.createDataFrame(emb_t.to_pandas())
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(emb, "vec_id", "embedding", threshold=0.8).collect()
    }
    assert len(brute) >= 50, "fixture must plant enough cos>=0.8 pairs"
    lsh = {
        (r.id_a, r.id_b)
        for r in lsh_bucketed_pairs(
            emb, "vec_id", "embedding", threshold=0.8, bits=8, tables=8
        ).collect()
    }
    assert lsh <= brute
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.9, f"clustered-corpus LSH recall {recall:.2f} < 0.9"
    # blocking blocks: candidates ≈ planted pairs, nowhere near all-pairs
    assert len(lsh) <= 2 * len(brute)


def test_minhash_recall_on_clustered_corpus(spark):
    """MinHash banding at the bench parameters (r=4 × 16 bands) over the
    clustered document fixture: ≥ 90% of the planted jaccard≈0.8 pairs
    surface as candidates, and background pairs effectively never do."""
    from bench import make_clustered_corpus
    from kubernetes_logs_datalake_spark.operators.dedup import minhash_lsh_candidates

    _, docs_t = make_clustered_corpus(n_bg_e=0, n_pl_e=0, n_bg_d=300, n_pl_d=60)
    docs = spark.createDataFrame(docs_t.to_pandas())
    # planted pair ids: (base_i, dup_i) = (300+i, 360+i)
    planted = {(300 + i, 360 + i) for i in range(60)}
    cand = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in minhash_lsh_candidates(
            docs, "doc_id", "text", num_hashes=64, bands=16, n=1
        ).collect()
    }
    recall = len(cand & planted) / len(planted)
    assert recall >= 0.9, f"clustered-corpus MinHash recall {recall:.2f} < 0.9"
    false_pos = cand - planted
    assert len(false_pos) <= len(planted) // 4, f"too many background candidates: {len(false_pos)}"


def test_embedding_dedup_max_rows_guard(spark):
    """The all-pairs embedding oracle refuses oversized inputs with a
    pointer to the LSH scale path (VERDICT r2: make misuse impossible)."""
    import pytest

    from kubernetes_logs_datalake_spark.operators.dedup import embedding_dedup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="lsh_bucketed_pairs"):
        embedding_dedup_pairs(emb, "vec_id", "embedding", max_rows=10)
    # under the cap (and with the cap disabled) the operator still runs
    assert embedding_dedup_pairs(
        emb.limit(20), "vec_id", "embedding", threshold=0.35, max_rows=None
    ).count() >= 0


def test_lsh_bucketed_pairs_recall_vs_bruteforce(spark):
    """The banded-LSH embedding-dedup scale path must recover most
    brute-force pairs at the operating threshold, and (being an exact
    re-rank of a candidate subset) must never emit a pair brute force
    would not."""
    from kubernetes_logs_datalake_spark.operators.dedup import embedding_dedup_pairs
    from kubernetes_logs_datalake_spark.operators.similarity import lsh_bucketed_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(emb, "vec_id", "embedding", threshold=0.35).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in lsh_bucketed_pairs(
            emb, "vec_id", "embedding", threshold=0.35, bits=4, tables=16
        ).collect()
    }
    assert brute, "fixture produced no near-dup pairs; test is vacuous"
    assert lsh <= brute, "LSH emitted a pair the exact re-rank should have filtered"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.85, f"LSH recall {recall:.2f} below 0.85 ({len(brute)} true pairs)"


def test_lsh_bucketed_pairs_hot_bucket_guard(spark):
    """max_bucket skips oversized buckets: with a cap of 1 no bucket can
    produce a pair, so the result must be empty (bounded Σ bucket²)."""
    from kubernetes_logs_datalake_spark.operators.similarity import lsh_bucketed_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    got = lsh_bucketed_pairs(
        emb, "vec_id", "embedding", threshold=0.0, bits=2, tables=2, max_bucket=1
    ).count()
    assert got == 0


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """LSH banding tuned for the 0.7 similarity region must recover most
    truly-similar pairs (banded probability: 1-(1-s^r)^b)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(d, "doc_id", "text", n=1, threshold=0.7).collect()
    }
    candidates = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            d, "doc_id", "text", num_hashes=64, bands=16, n=1
        ).collect()
    }
    assert exact, "fixture produced no similar pairs; test is vacuous"
    recall = len(exact & candidates) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below 0.8 ({len(exact)} true pairs)"


def test_packed_signatures_bijective_to_unrolled(spark):
    """The packed nested-HOF signature path must induce the SAME
    bucketing as the unrolled per-plane form — per table, the mapping
    old-sig → new-sig is a bijection, so collision sets (the only
    semantics buckets carry) are identical."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.similarity import (
        _hyperplanes,
        lsh_signature,
        lsh_signatures_packed,
    )

    dim, bits, tables, seed = 64, 4, 3, 42
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    old_cols = F.array(
        *[
            lsh_signature(
                F.col("embedding"), _hyperplanes(dim, bits, seed + 7919 * t)
            )
            for t in range(tables)
        ]
    )
    new_cols = lsh_signatures_packed("embedding", dim, bits, tables, seed)
    rows = emb.select(
        old_cols.alias("old"), new_cols.alias("new")
    ).collect()
    for t in range(tables):
        fwd: dict[int, int] = {}
        rev: dict[int, int] = {}
        for r in rows:
            o, n = r.old[t], r.new[t]
            assert fwd.setdefault(o, n) == n, "old sig maps to two new sigs"
            assert rev.setdefault(n, o) == o, "two old sigs collide in new"


def test_pq_adc_recall_on_clustered_corpus(spark):
    """On the clustered fixture, PQ/ADC at m=4×16 codes must surface a
    query's planted near-duplicate (cos ≈ 0.957) in its top-10 — the
    compressed-serving guarantee that matters for dedup/retrieval.
    (On the driver's uniform-random corpus ADC recall of the EXACT
    top-10 is ~0 — random vectors have no structure for 4 nibbles to
    preserve; the registered ann_recall_pq documents that honestly,
    this test shows the operator works where near neighbors exist.)"""
    from bench import make_clustered_corpus
    from kubernetes_logs_datalake_spark.operators.vectors import (
        pq_adc_topk,
        pq_codebooks,
    )

    emb_t, _ = make_clustered_corpus(n_bg_e=300, n_pl_e=60, n_bg_d=0, n_pl_d=0)
    emb = spark.createDataFrame(emb_t.to_pandas())
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    books = pq_codebooks(emb, "vec_id", "embedding", dim=64, m=4, k=16, iters=3)
    hits = 0
    queries = list(range(300, 308))  # planted-pair bases; dup = qi + 60
    for qi in queries:
        out = pq_adc_topk(
            emb.filter(f"vec_id != {qi}"),
            "vec_id",
            "embedding",
            vecs[qi],
            dim=64,
            m=4,
            k=16,
            iters=3,
            topk=10,
            codebooks=books,
        )
        hits += (qi + 60) in [r["vec_id"] for r in out.collect()]
    assert hits >= 7, f"planted-dup ADC recall {hits}/8 < 7/8"
