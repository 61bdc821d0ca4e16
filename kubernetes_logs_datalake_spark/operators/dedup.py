"""Deduplication operators for document corpora.

Five families, each a different cost/recall point for 100 TB dedup:

- **exact**: hash-groupBy on a normalized fingerprint. One shuffle on
  the fingerprint; at scale the cheapest and always the first pass.
- **n-gram Jaccard**: exact set-similarity via shingle inverted index
  (explode → self-join on shingle → count). Quadratic in bucket size —
  correct but only viable after blocking; it is also the *oracle* for
  the approximate families below.
- **MinHash + LSH**: k min-hashes over shingles → banded signatures →
  candidate pairs from band-bucket joins. The standard near-dup path at
  corpus scale: linear scans + one shuffle per band, no all-pairs.
- **SimHash**: 64-bit sign-aggregated fingerprint; near-dups differ in
  few bits. Candidates via band equality on bit-chunks.
- **embedding cosine**: semantic near-dup over `array<float>` vectors.

Hashing comes in two families:

- ``xxh64`` (default): ``xxhash64`` with fixed seeds — the fast scale
  path (single JVM-side hash per shingle, derived k-family over the
  fixed-width long). Deterministic across runs and executors.
- ``portable``: a 60-bit base hash from md5 (the one hash both Spark
  and DuckDB implement identically) + a Carter-Wegman affine family
  ``(a_k·base + b_k) mod 2^61-1`` in exact decimal arithmetic. Slower
  (md5 + decimal ops), but every value is reproducible in ANSI SQL, so
  the driver's DuckDB oracle can hash-check the full candidate-pair
  output. Contract queries use this family; large-scale dedup keeps
  the default.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.text import fingerprint, shingles
from kubernetes_logs_datalake_spark.functions.vectors import cosine

# Mersenne prime 2^61-1: modulus of the portable affine hash family.
PORTABLE_P = (1 << 61) - 1
# multiplier for chaining band-row values into one bucket key
PORTABLE_M = 1_000_003
_PORTABLE_SEED = 20260814


def portable_base_hash(c: Column | str) -> Column:
    """60-bit long from the first 15 hex chars of md5 — bit-identical
    in Spark and DuckDB (conv/list_reduce respectively)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_affine_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """The portable family's (a_k, b_k) pairs — seeded, so the Spark
    operator and the generated DuckDB oracle share one source of truth."""
    rng = random.Random(_PORTABLE_SEED)
    return [
        (rng.randrange(1, PORTABLE_P), rng.randrange(PORTABLE_P))
        for _ in range(num_hashes)
    ]

# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) text.

    groupBy on the md5 fingerprint — map-side partial aggregation makes
    this one narrow shuffle of (fingerprint, min_id) pairs, never the
    documents themselves.
    """
    fp = fingerprint(text_col).alias("fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# --------------------------------------------------------- n-gram Jaccard


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    with_size: bool = False,
) -> DataFrame:
    """(id, shingle) pairs, distinct per document — deduped MAP-SIDE
    (``array_distinct`` before the explode): a document's grams all
    live in one array cell, so per-doc distinctness never needs the
    full (id, shingle) exchange a post-explode ``.distinct()`` pays
    (guide §2.4 — one corpus-gram shuffle removed from every consumer:
    the jaccard/containment kernels, the prefix join, novelty,
    common-ngrams, the fuzzy join). ``with_size=True`` additionally
    emits the set size as ``sz``, computed on the unexploded array, so
    callers needing |set| skip their per-doc window/aggregate exchange
    too."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(text_col, n)).alias("_arr"),
    )
    cols = [F.col("_id"), F.explode("_arr").alias("shingle")]
    if with_size:
        cols.append(F.size("_arr").alias("sz"))
    return base.select(*cols)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs with word-``n``-gram Jaccard ≥ threshold.

    Inverted-index join: explode shingles, self-join on the shingle,
    count intersections, compute |A∩B| / (|A|+|B|-|A∩B|). Cost is
    Σ df² over shingle document-frequencies, so a shingle appearing in
    k documents contributes k² join rows — on a real corpus a single
    stopword-frequency shingle ("the") is quadratic in corpus size.

    ``max_df`` is the guard: shingles with document frequency > max_df
    are dropped from the index *and* from the set sizes before the
    join, bounding the join at Σ min(df, max_df)² ≤ |index| · max_df.
    Semantics with the cap: Jaccard over the retained (discriminative)
    shingles — the standard stopword-shingle prefilter; near-dup pairs
    that share *only* ultra-common shingles are below any useful
    threshold anyway. ``max_df=None`` keeps the exact semantics (the
    oracle mode — only safe standalone after LSH blocking,
    ``minhash_lsh_candidates``).
    """
    return _set_jaccard_pairs(
        shingle_sets(df, id_col, text_col, n, with_size=True),
        "shingle", threshold, max_df,
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
    scale: int = 6,
) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram *containment*:
    C(A in B) = |A∩B| / |A|. Jaccard misses subset duplication — a
    short document quoted whole inside a long one scores low Jaccard
    (union is large) but containment 1.0; this is the quote/excerpt
    detector complementing :func:`ngram_jaccard_pairs` (cf. Broder's
    resemblance-vs-containment distinction, 1997).

    Returns pairs where EITHER direction's containment ≥ threshold:
    (id_a, id_b, cont_a, cont_b) — cont_a is how much of A lies inside
    B and vice versa, both rounded to ``scale``. Same inverted-index
    join + ``max_df`` hot-shingle guard as the Jaccard kernel: one
    equi-join on the shingle, Σ min(df, max_df)² bounded, never
    all-pairs.
    """
    pairs = _pair_intersections(
        shingle_sets(df, id_col, text_col, n, with_size=True), "shingle", max_df
    )
    return (
        pairs.filter(
            F.greatest(
                F.col("inter") / F.col("sz_a"), F.col("inter") / F.col("sz_b")
            )
            >= threshold
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") / F.col("sz_a"), scale).alias("cont_a"),
            F.round(F.col("inter") / F.col("sz_b"), scale).alias("cont_b"),
        )
    )


def _pair_intersections(
    sets: DataFrame, key: str, max_df: int | None
) -> DataFrame:
    """Inverted-index pair-count kernel over distinct ``(_id, key)``
    set rows: (id_a, id_b, inter, sz_a, sz_b) for every pair sharing
    ≥1 key — shared by :func:`_set_jaccard_pairs` (Jaccard) and
    :func:`containment_pairs` (asymmetric containment). One
    self-equi-join on the key, never all-pairs; ``max_df`` bounds the
    quadratic contribution of corpus-frequency keys."""
    if max_df is not None:
        keep = (
            sets.groupBy(key)
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select(key)
        )
        sets = sets.drop("sz").join(keep, key, "left_semi")
    if "sz" not in sets.columns:
        # carry each document's set size on the set rows via one window
        # (cardinality = docs, perfectly spread) instead of a separate
        # sizes relation — no session-lifetime cache() leak, and the two
        # post-aggregation size joins disappear. Only needed when the
        # caller didn't attach a map-side size (shingle_sets
        # with_size=True) or when max_df re-defines |set| as the
        # retained-shingle count (post-filter sizes by contract).
        from pyspark.sql import Window

        sets = sets.withColumn(
            "sz", F.count("*").over(Window.partitionBy("_id"))
        )
    a = sets.alias("a")
    b = sets.alias("b")
    return (
        a.join(b, key)
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.min("a.sz").alias("sz_a"),
            F.min("b.sz").alias("sz_b"),
        )
    )


def _set_jaccard_pairs(
    sets: DataFrame, key: str, threshold: float, max_df: int | None
) -> DataFrame:
    """Jaccard over the :func:`_pair_intersections` kernel — used by
    :func:`ngram_jaccard_pairs` (key=shingle) and :func:`winnow_pairs`
    (key=fingerprint)."""
    return (
        _pair_intersections(sets, key, max_df)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------- MinHash + LSH


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    n: int = 3,
    hash_family: str = "xxh64",
) -> DataFrame:
    """(id, array<long> signature): one explode of shingles, then
    ``num_hashes`` min-aggregations in a single groupBy — the whole
    signature costs one shuffle regardless of k.

    Two deliberate scale choices:

    - **no per-doc distinct**: ``min`` is idempotent over duplicate
      shingles, so the set-semantics shuffle ``shingle_sets`` pays
      (needed there for Jaccard set sizes) is pure waste here — raw
      exploded rows feed the partial aggregation directly, and the
      only shuffle is the map-side-combined (id → 64 mins) one.
    - **derived hash family**: each shingle is string-hashed ONCE
      (``xxhash64(shingle)``); the k functions are
      ``xxhash64(base, seed)`` over the fixed-width long — ~¼ the
      hashing cost of k independent variable-length string hashes, the
      same construction datasketch-style MinHash uses (k permutations
      of one base hash). Recall is gated by
      ``tests/test_similarity_quality.py``.
    """
    # materialize the per-shingle base hash as a COLUMN before the
    # aggregation instead of inlining it into every min-expression:
    # with k agg buffers the aggregate can fall out of whole-stage
    # codegen, losing common-subexpression elimination — inlined, the
    # string hash (or the md5 portable base) would then run k times per
    # row (measured ~20% suite cost for xxh64; far worse for md5)
    if hash_family == "portable":
        base_hash = portable_base_hash("shingle").cast("decimal(38,0)")
    else:
        base_hash = F.xxhash64(F.col("shingle"))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(text_col, n)).alias("shingle"),
    ).select("_id", base_hash.alias("_hb"))
    if hash_family == "portable":
        hb = F.col("_hb")
        mins = [
            F.min(((F.lit(a).cast("decimal(38,0)") * hb + F.lit(b)) % F.lit(PORTABLE_P)).cast("long")).alias(f"h{k}")
            for k, (a, b) in enumerate(minhash_affine_coeffs(num_hashes))
        ]
    else:
        # SQL-text form (r15): identical tree to
        # min(xxhash64(_hb, seed)) per seed, one JVM parse per column
        # instead of ~5 py4j round-trips each (see sql_double's note)
        mins = [
            F.expr(f"min(xxhash64(_hb, {seed})) AS h{seed}")
            for seed in range(num_hashes)
        ]
    agg = base.groupBy("_id").agg(*mins)
    return agg.select(
        "_id",
        F.expr(
            "array(%s)" % ",".join(f"h{s}" for s in range(num_hashes))
        ).alias("signature"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    hash_family: str = "xxh64",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    documents colliding in any band's bucket become a candidate pair.
    Pair generation is a self-join on (band, bucket_hash) — each band is
    a narrow equi-join on a 64-bit key, no all-pairs blowup. Callers
    re-rank candidates with ``ngram_jaccard_pairs`` semantics on the
    (small) candidate set. Band buckets hash the row longs directly
    (``xxhash64(h_0, …, h_r)``) — no per-row string materialization.

    ``signatures`` lets a caller that already built the signature table
    (e.g. :func:`minhash_calibration`) share one hashing pass instead of
    recomputing the shingle explode + k-min aggregation.
    """
    rows = num_hashes // bands
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(df, id_col, text_col, num_hashes, n, hash_family)
    )
    if hash_family == "portable":
        # chain the band's row values into one exact 61-bit bucket key:
        # ((h0·M + h1)·M + …) mod 2^61-1, reproducible in DuckDB HUGEINT
        def bucket_of(b: int) -> Column:
            acc = F.element_at("signature", b * rows + 1).cast("decimal(38,0)")
            for r in range(1, rows):
                acc = (acc * F.lit(PORTABLE_M) + F.element_at("signature", b * rows + r + 1)) % F.lit(PORTABLE_P)
            return acc.cast("long")

        band_arr = F.array(*[bucket_of(b) for b in range(bands)])
    else:
        band_arr = F.expr(
            "array(%s)"
            % ",".join(
                "xxhash64(%s)"
                % ",".join(
                    f"element_at(signature, {b * rows + r + 1})"
                    for r in range(rows)
                )
                for b in range(bands)
            )
        )
    banded = sig.select("_id", F.posexplode(band_arr).alias("band", "bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


# ----------------------------------------------------------------- SimHash


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    hash_family: str = "xxh64",
) -> DataFrame:
    """SimHash per document: hash each word, sum ±1 per bit position
    weighted by presence, take sign bits. Pure column algebra over one
    explode; returns (id, simhash long). The portable family's base
    hash is 60-bit, so bits is clamped to 60 with it (sign bits above
    the base hash's width would be computed over constant zeros)."""
    from kubernetes_logs_datalake_spark.functions.text import words

    if hash_family == "portable":
        bits = min(bits, 60)
    word_hash = (
        portable_base_hash("w") if hash_family == "portable" else F.xxhash64("w")
    )
    exploded = df.select(
        F.col(id_col).alias("_id"), F.explode(words(text_col)).alias("w")
    ).withColumn("h", word_hash)
    bit_sums = exploded.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return bit_sums.select("_id", acc.alias("simhash"))


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
    bits: int = 64,
    hash_family: str = "xxh64",
) -> DataFrame:
    """Near-dup candidates: by pigeonhole, two simhashes within
    ``max_hamming`` ≤ chunks-1 bits share at least one identical
    bit-chunk → equi-join per chunk, then exact hamming filter."""
    if hash_family == "portable":
        bits = min(bits, 60)
    sh = simhash(df, id_col, text_col, bits, hash_family)
    width = bits // chunks
    chunk_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1))
            for i in range(chunks)
        ]
    )
    pieces = sh.select("_id", "simhash", F.posexplode(chunk_arr).alias("chunk_idx", "chunk"))
    a, b = pieces.alias("a"), pieces.alias("b")
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------ winnowing fingerprints


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints: (id, fingerprint) pairs.

    Character ``k``-grams of the normalized text are hashed; each
    sliding window of ``window`` consecutive hashes contributes its
    minimum; the distinct minima are the document's fingerprints. Two
    documents sharing a sufficiently long substring (≥ k + window - 1
    chars) are guaranteed to share a fingerprint — the standard
    content-defined selection for plagiarism/near-dup detection, with
    density 2/(window+1) regardless of document length.

    Pure column HOFs (transform/slice/array_min) — JVM-side, no UDF.
    md5 is the gram hash so the DuckDB oracle reproduces values exactly
    (lexicographic min over fixed-width hex == numeric min). At corpus
    scale the output feeds the same inverted-index/banding joins as
    shingles, at ~2/(window+1) of the index size.
    """
    base = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", "")
    # guard short inputs explicitly: Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0], not an empty array
    grams = F.expr(
        f"case when length(_b) >= {k} then"
        f" transform(sequence(1, length(_b) - {k - 1}),"
        f" i -> md5(substring(_b, i, {k})))"
        f" else array() end"
    )
    mins = F.expr(
        f"case when size(_g) >= {window} then"
        f" array_distinct(transform(sequence(1, size(_g) - {window - 1}),"
        f" j -> array_min(slice(_g, j, {window}))))"
        f" else array() end"
    )
    return (
        df.select(F.col(id_col).alias("_id"), base.alias("_b"))
        .select("_id", grams.alias("_g"))
        .select("_id", F.explode(mins).alias("fp"))
        .select(F.col("_id").alias(id_col), "fp")
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by Jaccard over winnowing fingerprints — the pair
    operator the fingerprint family feeds.

    Same inverted-index + ``max_df`` join as the shingle path
    (:func:`_set_jaccard_pairs`) but over :func:`winnowing_fingerprints`,
    so the index is ~2/(window+1) the size of a full shingle index while
    still guaranteeing that any shared substring ≥ k + window - 1 chars
    surfaces as a shared key. The cheap long-shared-substring detector
    (plagiarism/boilerplate/license-text dedup) next to the word-n-gram
    Jaccard's bag-of-shingles similarity. Oracle-exact: md5 gram hashes
    and hex-min selection reproduce in ANSI SQL.
    """
    fps = winnowing_fingerprints(df, id_col, text_col, k, window).select(
        F.col(id_col).alias("_id"), F.col("fp")
    )
    return _set_jaccard_pairs(fps, "fp", threshold, max_df)


# ------------------------------------------------- component resolution


def quality_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality: Column,
) -> DataFrame:
    """Quality-aware canonical selection: resolve near-dup ``pairs``
    into clusters (connected components) and keep each cluster's
    highest-``quality`` member (ties to the lowest id) instead of the
    arbitrary min-id representative — the end-to-end shape of corpus
    dedup when duplicates differ in cleanliness (boilerplate stripped
    vs not, truncated vs full).

    Output: (component, id, quality, keep) for every document that has
    at least one near-duplicate. One window per component — component
    cardinality ≈ duplicate clusters, perfectly spread; never global.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs)
    q = df.select(F.col(id_col), quality.alias("_q"))
    memb = comp.join(q, comp["node"] == q[id_col]).select(
        F.col("component"), F.col(id_col), F.col("_q")
    )
    w = Window.partitionBy("component").orderBy(F.desc("_q"), id_col)
    return (
        memb.withColumn("_rk", F.row_number().over(w))
        .select(
            "component",
            F.col(id_col),
            F.col("_q").alias("quality"),
            (F.col("_rk") == 1).alias("keep"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Resolve near-duplicate *pairs* into duplicate *groups*: each node
    labeled with the minimum id reachable in its connected component
    (the canonical representative to keep).

    Iterative min-label propagation with pointer doubling — each round
    every node takes the min of its own, its neighbors', and its
    *label's* label (one extra self-join that shortcuts chains), so
    convergence is O(log diameter) rounds instead of O(diameter) — the
    Pregel-style shape accelerated the pointer-jumping way (the same
    round-compression idea as the large-star/small-star CC of Kiveris
    et al. 2014). The fixpoint (min reachable id per component) is
    unique, so the shortcut changes round count, never the result.
    Per round: one edges⋈labels shuffle join + one min-aggregate + one
    labels self-join; ``localCheckpoint`` truncates the growing
    lineage (or the reliable checkpointer when ``checkpoint_dir`` is
    set — see :mod:`.lineage` — so the job survives executor loss on
    dynamic/spot clusters; output is bit-identical either way).
    Deterministic; terminates early on convergence.
    """
    from .lineage import reliable_this_round, truncate_lineage

    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = truncate_lineage(sym.distinct(), checkpoint_dir, eager=True)
    # Round-0 seed (r15): with identity labels, the first round's
    # neighbor-min JOIN degenerates to min(dst) per src — fold it into
    # the init as one aggregation over the symmetric edges (no join, no
    # pointer jump). Bit-identical fixpoint (the min-reachable-id label
    # is unique), one fewer full propagation round — which at scale is
    # one fewer edges⋈labels pass, and at bench scale ~1 s per CC call.
    labels = truncate_lineage(
        sym.groupBy("src")
        .agg(F.min("dst").alias("_m"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("_m")).alias("label"),
        ),
        checkpoint_dir,
        eager=True,
    )
    converged = False
    for _it in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = labels.join(nbr_min, labels.node == nbr_min.src, "left").select(
            "node",
            F.col("label").alias("_old"),
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # pointer jump: also adopt label(label) — reachability is
        # transitive, so this halves the remaining chain length
        lab2 = prop.select(
            F.col("node").alias("_n2"), F.col("label").alias("_l2")
        )
        # carry the previous label through the round so convergence is
        # a scan of the checkpointed blocks, not another shuffle join;
        # lazy checkpoint + FULL count: the count touches every
        # partition, so one job both materializes the checkpoint and
        # decides convergence. (A limit(1).count() here would
        # short-circuit after the first changed partition and leave
        # the rest un-checkpointed, letting later rounds recompute
        # them through the accumulated join lineage.)
        jumped = truncate_lineage(
            prop.join(lab2, prop.label == lab2._n2, "left").select(
                "node",
                "_old",
                F.least(F.col("label"), F.coalesce("_l2", "label")).alias("label"),
            ),
            reliable_this_round(checkpoint_dir, _it, checkpoint_every),
        )
        changed = jumped.filter(F.col("label") != F.col("_old")).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning would SPLIT long-diameter duplicate chains
        # into multiple components — duplicates would leak undetected
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


# ------------------------------------------------------- embedding cosine


def embedding_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Semantic near-dup pairs: cosine ≥ threshold.

    Brute-force all-pairs join — exact, oracle-checkable, and O(n²):
    this is the *oracle* for ``operators.similarity.lsh_bucketed_pairs``
    (random-hyperplane blocking), not the corpus-scale path. To make
    misuse impossible, the operator counts its input and raises above
    ``max_rows`` (default 100k ≈ 5·10⁹ candidate pairs, already days of
    work) with a pointer to the LSH path; pass ``max_rows=None`` only in
    tests/oracles that knowingly bound the input themselves.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import cosine_prenorm, norm

    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_dedup_pairs is the all-pairs oracle: input has "
                f"{n} rows > max_rows={max_rows} (≈{n * (n - 1) // 2:.2g} "
                f"candidate pairs). Use operators.similarity."
                f"lsh_bucketed_pairs for corpus-scale embedding dedup, or "
                f"raise max_rows explicitly if you accept the O(n²) cost."
            )

    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        norm(vec_col).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        norm(vec_col).alias("_nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_prenorm("va", "vb", "_na", "_nb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# -------------------------------------------------- incremental dedup


def dedup_incremental(
    new_df: DataFrame, corpus_df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact dedup of an incoming batch against an existing corpus —
    the per-ingest pass a continuously-growing training lake runs so
    recrawled/reposted documents never enter twice. Output, one row per
    new-batch document: (id, dup_of_corpus, dup_in_batch, novel) where
    ``novel`` = not seen in the corpus AND first occurrence (min id)
    within the batch.

    Plan: both sides reduce to normalized-text fingerprints; the corpus
    side aggregates to DISTINCT fingerprints before the join, so the
    join input is the corpus's unique-content cardinality, not its row
    count; the batch side shuffles once on the fingerprint for the
    within-batch canonical min. Both shuffles key on md5 — uniformly
    spread at any scale. (At steady state a real deployment keeps the
    corpus-fingerprint table materialized and bucketed by fingerprint,
    making the anti-join co-located and shuffle-free on the corpus
    side; the operator's join keys are chosen so that layout applies.)
    """
    from kubernetes_logs_datalake_spark.functions.text import fingerprint

    new_fp = new_df.select(
        F.col(id_col), fingerprint(text_col).alias("_fp")
    )
    corpus_fp = (
        corpus_df.select(fingerprint(text_col).alias("_fp"))
        .distinct()
        .withColumn("_in_corpus", F.lit(True))
    )
    joined = new_fp.join(corpus_fp, "_fp", "left")
    canon = new_fp.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    return (
        joined.join(canon, "_fp")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_in_corpus"), F.lit(False)).alias(
                "dup_of_corpus"
            ),
            (F.col(id_col) != F.col("_keep_id")).alias("dup_in_batch"),
            (
                F.coalesce(F.col("_in_corpus"), F.lit(False)).eqNullSafe(False)
                & (F.col(id_col) == F.col("_keep_id"))
            ).alias("novel"),
        )
    )


def corpus_diff(
    old_df: DataFrame, new_df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Content-level diff between two corpus snapshots — the "what
    changed since the last release" audit for versioned training data.
    One row per id present in either snapshot:
    (id, status ∈ {added, removed, modified, unchanged}).

    ``modified`` compares normalized-text fingerprints, so whitespace/
    case-only churn reads as ``unchanged`` (the same normalization the
    dedup family keys on). Plan: two fingerprint scans, one full outer
    join on the id — at 100 TB both sides shuffle once on the id; with
    both snapshots bucketed by id (the natural lake layout for
    versioned corpora) the join is co-located and shuffle-free.
    """
    from kubernetes_logs_datalake_spark.functions.text import fingerprint

    o = old_df.select(F.col(id_col), fingerprint(text_col).alias("_fo"))
    n = new_df.select(F.col(id_col), fingerprint(text_col).alias("_fn"))
    return (
        o.join(n, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.when(F.col("_fo").isNull(), F.lit("added"))
            .when(F.col("_fn").isNull(), F.lit("removed"))
            .when(F.col("_fo") != F.col("_fn"), F.lit("modified"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


# ----------------------------------------------------- calibration


def minhash_calibration(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    hash_family: str = "xxh64",
    scale: int = 6,
) -> DataFrame:
    """The verify/refine stage of two-phase MinHash dedup, doubling as a
    sketch-calibration report: for every LSH candidate pair, the
    signature-estimated Jaccard (fraction of equal MinHash components —
    the datasketch estimator) next to the exact shingle-set Jaccard and
    their absolute error. Output: (id_a, id_b, est_jaccard, jaccard,
    abs_err).

    This is the step that makes banded LSH safe to act on at scale:
    candidates are cheap and over-inclusive; deletions should use the
    exact (or estimated, at tolerance) similarity computed *only on the
    candidate set*.

    Plan: the candidate set (banded equi-join, never all-pairs) drives
    everything — signatures join to it by id (two hash joins), and the
    exact intersection joins the per-doc DISTINCT shingle rows through
    the (id, shingle) keys of candidate members only. No all-pairs
    stage anywhere; cost is |candidates| × avg shingle count. The
    signature table is built ONCE (lazy localCheckpoint: materialized
    on first action, then shared by the banding join and the two
    per-side estimate joins — without it the shingle explode + k-min
    aggregation would re-run for each of its three plan references).
    """
    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, n, hash_family
    ).localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, n, hash_family, signatures=sig
    )
    est = (
        cands.join(sig.select(F.col("_id").alias("id_a"), F.col("signature").alias("_sa")), "id_a")
        .join(sig.select(F.col("_id").alias("id_b"), F.col("signature").alias("_sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v))
                / F.lit(num_hashes)
            ).alias("_est"),
        )
    )
    # exact verify via per-doc shingle ARRAYS (r16, guide §2.3/§2.4 —
    # the jaccard_prefix_join pattern): one MAP-ONLY array projection
    # per document (distinct grams never leave their row), attached to
    # the candidate pair by two id-keyed joins, intersection counted
    # in-task. The old shape paid the exploded (id, shingle) distinct
    # exchange three times (sz agg + both verify sides), a
    # token-granularity verify join, a pair aggregation and two size
    # joins; all of it collapses into these two joins. A candidate
    # pair with zero shared shingles keeps _inter = 0 directly (the
    # old left-join backfill is structural now). Candidates always
    # have ≥1 shingle (they carry a signature), so the inner joins
    # drop nothing — same as the old sz joins.
    arr = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(text_col, n)).alias("_sh"),
    )
    out = (
        est.join(
            arr.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_ga")),
            "id_a",
        )
        .join(
            arr.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_gb")),
            "id_b",
        )
        .withColumn("_inter", F.size(F.array_intersect("_ga", "_gb")))
        .withColumn(
            "_jac",
            F.col("_inter")
            / (F.size("_ga") + F.size("_gb") - F.col("_inter")),
        )
    )
    return out.select(
        "id_a",
        "id_b",
        F.round("_est", scale).alias("est_jaccard"),
        F.round("_jac", scale).alias("jaccard"),
        F.round(F.abs(F.col("_est") - F.col("_jac")), scale).alias("abs_err"),
    )


def fuzzy_text_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    n: int = 3,
    threshold: float = 0.5,
    metric: str = "containment",
    max_df: int | None = None,
    scale: int = 6,
) -> DataFrame:
    """Cross-table fuzzy join on text similarity — record linkage /
    entity resolution / snippet-to-source lookup as one inverted-index
    equi-join, never a cross join.

    Matches every ``left`` row to the ``right`` rows whose word-n-gram
    sets overlap enough: ``metric="containment"`` scores
    |L∩R| / |L| (how much of the left text appears in the right —
    the snippet-lookup / quote-attribution semantics),
    ``metric="jaccard"`` scores symmetric overlap. Output:
    (left_id, right_id, score ≥ threshold).

    Scale shape: both sides explode to (id, shingle) sets, join ON THE
    SHINGLE (cost Σ df_L·df_R per shingle), aggregate per pair. The
    ``max_df`` guard drops corpus-frequency shingles from BOTH sides
    and both set sizes, bounding the join exactly as in
    :func:`ngram_jaccard_pairs`.
    """
    if metric not in ("containment", "jaccard"):
        raise ValueError(f"unknown metric {metric!r}")
    sa = shingle_sets(left, left_id, left_text, n, with_size=True)
    sb = shingle_sets(right, right_id, right_text, n, with_size=True)
    if max_df is not None:
        # |set| is re-defined as the RETAINED-shingle count when hot
        # shingles are dropped (post-filter sizes by contract), so the
        # map-side size is recomputed with a per-doc window here
        df_counts = (
            sa.select("shingle")
            .unionAll(sb.select("shingle"))
            .groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        from pyspark.sql import Window

        sa = (
            sa.drop("sz")
            .join(df_counts, "shingle", "left_semi")
            .withColumn("sz", F.count("*").over(Window.partitionBy("_id")))
        )
        sb = (
            sb.drop("sz")
            .join(df_counts, "shingle", "left_semi")
            .withColumn("sz", F.count("*").over(Window.partitionBy("_id")))
        )
    # sizes ride the set rows (map-side via shingle_sets with_size when
    # max_df is off — both per-doc window exchanges removed, r16)
    sa = sa.withColumn("sz_l", F.col("sz"))
    sb = sb.withColumn("sz_r", F.col("sz"))
    a = sa.select(
        F.col("_id").alias("_lid"), F.col("shingle"), F.col("sz_l")
    )
    b = sb.select(
        F.col("_id").alias("_rid"), F.col("shingle"), F.col("sz_r")
    )
    pairs = (
        a.join(b, "shingle")
        .groupBy("_lid", "_rid")
        .agg(
            F.count("*").alias("inter"),
            F.min("sz_l").alias("sz_l"),
            F.min("sz_r").alias("sz_r"),
        )
    )
    if metric == "containment":
        score = F.col("inter") / F.col("sz_l")
    else:
        score = F.col("inter") / (
            F.col("sz_l") + F.col("sz_r") - F.col("inter")
        )
    return (
        pairs.withColumn("_score", score)
        .filter(F.col("_score") >= threshold)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.round("_score", scale).alias("score"),
        )
    )


def jaccard_prefix_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    scale: int = 4,
) -> DataFrame:
    """Exact Jaccard self-join with PREFIX FILTERING (the SSJoin /
    PPJoin candidate rule — Chaudhuri et al. 2006, Xiao et al. 2008):
    identical output to :func:`ngram_jaccard_pairs`, asymptotically
    cheaper index.

    Rule: order every document's shingles by a global canonical order
    (ascending document frequency, then shingle — rarest first); two
    sets with Jaccard ≥ t MUST share a token within each one's first
    ``s − ⌈t·s⌉ + 1`` tokens. So only the prefix enters the inverted
    index: the join degree of a hot shingle drops from its full df to
    its df *among documents where it is prefix-ranked* — stopword-ish
    shingles (high df → last in canonical order) fall out of the index
    entirely, which is what `max_df` approximates lossily; prefix
    filtering is LOSSLESS, so the brute-force Jaccard SQL is the
    oracle, not a re-derivation.

    ⌈t·s⌉ is computed in integer arithmetic over basis points, with the
    threshold rounded TOWARD ZERO to 4 dp — a float ceil at exactly t·s
    integral would overshoot, and rounding the threshold UP (e.g.
    2/3 → 0.6667) would shorten the prefix below the lossless PPJoin
    bound and silently drop true pairs with jaccard in
    [t, round(t)). Flooring can only lengthen the prefix (more
    candidates, never fewer), so losslessness is preserved for every
    caller-supplied threshold; the final filter still uses the exact
    raw threshold.

    Plan: df count (vocab-keyed agg) → per-doc rank window → prefix
    index equi-join → candidate pairs → one verification join computing
    the true intersection for candidates only. Candidate verification
    work is Σ|A| over candidate pairs, not Σdf² over the corpus.

    Measured A/B vs the plain index (SCALE.md): **12× faster on a
    zipfian corpus** (hot head + rare tail — the real web-crawl df
    shape: 2.3 s vs 28.2 s, identical output), but SLOWER when the df
    distribution is uniformly hot (prefixes still collide and the
    verify join pays for a huge candidate set) or uniformly rare (the
    plain index is already cheap). Pick by df shape; this is the
    lossless tool for real crawls, `max_df` the lossy one for
    pathological vocabularies.
    """
    from pyspark.sql import Window

    # the distinct shingle table feeds FIVE plan references (df count,
    # rank window, size agg, both verify sides); checkpoint it once so
    # the explode+DISTINCT shuffle runs once, not per reference — the
    # same shared-signature pattern as minhash_calibration
    sets = shingle_sets(
        df, id_col, text_col, n, with_size=True
    ).localCheckpoint(eager=False)
    dfreq = sets.groupBy("shingle").agg(F.count("*").alias("_df"))
    ranked = (
        sets.join(dfreq, "shingle")
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("_df", "shingle")
            ),
        )
        # |set| rides the set rows map-side (shingle_sets with_size) —
        # no second window over the _id partition needed (r16)
        .withColumn("_sz", F.col("sz"))
    )
    tbp = math.floor(threshold * 10_000)
    req = F.floor((F.lit(tbp) * F.col("_sz") + F.lit(9_999)) / F.lit(10_000))
    # the prefix table feeds both sides of the candidate join; without
    # the checkpoint the dfreq join + rank window above run twice. Only
    # the four columns the candidate join needs are checkpointed (§2.3
    # — _df/sz would otherwise ride every checkpointed block)
    prefix = ranked.filter(
        F.col("_rk") <= F.col("_sz") - req + 1
    ).select("_id", "shingle", "_rk", "_sz").localCheckpoint(eager=False)
    a = prefix.select(
        F.col("_id").alias("id_a"), "shingle",
        F.col("_rk").alias("_ia"), F.col("_sz").alias("_sa"),
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), "shingle",
        F.col("_rk").alias("_ib"), F.col("_sz").alias("_sb"),
    )
    # candidate pairs with PPJoin's LENGTH and POSITIONAL filters
    # (Xiao et al. 2008 §3.2), both lossless:
    # - length: J ≥ t ⇒ min(|A|,|B|)/max(|A|,|B|) ≥ t.
    # - positional: the canonical-smallest common prefix token t*
    #   minimizes rank in BOTH docs simultaneously (ranks follow the
    #   one global order), no common token precedes it (it would be an
    #   earlier common prefix token in both), so
    #   overlap ≤ 1 + min(|A|−i*, |B|−j*); J ≥ t needs overlap ≥
    #   t/(1+t)·(|A|+|B|). Both checks in exact basis-point integers
    #   with the threshold floored (can only keep MORE candidates).
    # min(_ia)/min(_ib) over a pair's matched prefix tokens IS (i*, j*);
    # the groupBy replaces the old `.distinct()` — same shuffle, plus
    # the agg. Measured on the clustered bench fixture: 748k → 370k
    # candidates, and the filter costs LESS than the distinct it
    # replaces (1.2 s vs 2.0 s) while the verify stage halves.
    cands = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_sa", "_sb")
        .agg(F.min("_ia").alias("_i"), F.min("_ib").alias("_j"))
        .filter(
            (
                F.least(F.col("_sa"), F.col("_sb")) * F.lit(10_000)
                >= F.lit(tbp) * F.greatest(F.col("_sa"), F.col("_sb"))
            )
            & (
                (F.lit(1) + F.least(
                    F.col("_sa") - F.col("_i"), F.col("_sb") - F.col("_j")
                )) * F.lit(10_000 + tbp)
                >= F.lit(tbp) * (F.col("_sa") + F.col("_sb"))
            )
        )
        .select("id_a", "id_b", "_sa", "_sb")
    )
    # verify candidates against the FULL sets (exact intersection) via
    # per-doc shingle ARRAYS (r16, guide §2.3/§2.4): the old verify
    # exploded every candidate pair to |A| token rows through a second
    # token-keyed exchange plus a pair-keyed aggregation; instead
    # collect each doc's set into one array (one agg over the
    # checkpointed sets), attach both arrays to the candidate row, and
    # count the intersection in-task — sets are distinct per doc, so
    # size(array_intersect) IS |A∩B| exactly. The pair stage now
    # shuffles one row per candidate, never one row per candidate
    # token, and the post-verify aggregation disappears.
    # built ONCE behind a lazy checkpoint: the array table feeds both
    # candidate sides — without it the collect_list aggregation (and
    # its corpus-gram exchange) would run once per side
    arr = (
        sets.groupBy("_id")
        .agg(F.collect_list("shingle").alias("_sh"))
        .localCheckpoint(eager=False)
    )
    inter = (
        cands.join(
            arr.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha")),
            "id_a",
        )
        .join(
            arr.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb")),
            "id_b",
        )
        .select(
            "id_a", "id_b", "_sa", "_sb",
            F.size(F.array_intersect("_sha", "_shb")).alias("_i"),
        )
    )
    out = inter.withColumn(
        "jaccard",
        F.col("_i") / (F.col("_sa") + F.col("_sb") - F.col("_i")),
    ).filter(F.col("jaccard") >= threshold)
    return out.select(
        "id_a", "id_b", F.round("jaccard", scale).alias("jaccard")
    )
