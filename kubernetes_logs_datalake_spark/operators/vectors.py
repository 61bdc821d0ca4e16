"""Distributed element-wise vector aggregation: per-group embedding
centroids.

The reduction a clustering / class-prototype / IVF-training step needs:
mean vector per label over an ``array<float>`` column. Computed the
distributed way — posexplode to (group, position, value) rows so the
shuffle key is (group, position) and every element is a plain numeric
aggregate; the centroid is reassembled with an order-pinned
collect_list. No vector is ever materialized on the driver and no
group's whole membership ever lands in one task during the summation.

Exactness: elements are summed as DECIMAL(25,10) (order-independent —
float summation order varies with partitioning, which would make the
result nondeterministic run to run), with ONE double division at the
end; this is the repo's exact-sum recipe applied element-wise.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.vectors import float_round


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str, scale: int = 6,
    portable_round: bool = False,
) -> DataFrame:
    """(label, n_vectors, centroid: array<double>) — element-exact mean
    vector per label.

    Plan: one explode (map-side), one partial-agg shuffle on
    (label, pos) — cardinality |labels|·dim, perfectly balanced — then
    a tiny (|labels|·dim → |labels|) final agg whose collect_list is
    bounded by dim. Ragged inputs are fine: each position averages over
    the vectors that have it.

    ``portable_round=True`` switches the whole mean pipeline to
    engine-portable arithmetic — the k-means fit path uses it because
    its oracles re-derive centroids in DuckDB, where BOTH the
    float→DECIMAL cast (Spark goes through the shortest 17-digit repr,
    DuckDB through the exact binary expansion — r10 finding: the tails
    differ at ~1e-17 relative and occasionally flip a 6 dp rounding)
    and ``round(double)`` half-boundary semantics diverge. The portable recipe uses
    only correctly-rounded IEEE double ops plus exact integer sums:
    quantize each element to 1e-10 units with ``floor(v·1e10 + 0.5)``,
    sum those integers exactly (DECIMAL(38,0) ↔ HUGEINT), ONE double
    division by ``count·1e10``, then
    :func:`~kubernetes_logs_datalake_spark.functions.vectors.float_round`
    — every step bit-identical across engines by construction, at the
    cost of ≤5e-11 per-element quantization (invisible at 6 dp).
    """
    if portable_round:
        u = F.floor(F.col("_val").cast("double") * F.lit(1e10) + F.lit(0.5))
        mean = F.sum(u.cast("decimal(38,0)")).cast("double") / (
            F.count(F.lit(1)).cast("double") * F.lit(1e10)
        )
        avg = float_round(mean, scale)
    else:
        mean = (
            F.sum(F.col("_val").cast("decimal(25,10)")).cast("double")
            / F.count(F.lit(1))
        )
        avg = F.round(mean, scale)
    pos_val = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col)).alias("_pos", "_val"),
    )
    per_pos = pos_val.groupBy(label_col, "_pos").agg(
        avg.alias("_avg"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        per_pos.groupBy(label_col)
        .agg(
            F.max("_n").alias("n_vectors"),
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), F.col("_avg")))
            ).alias("_pairs"),
        )
        .select(
            F.col(label_col),
            F.col("n_vectors"),
            F.transform(F.col("_pairs"), lambda p: p["_avg"]).alias("centroid"),
        )
    )


def quantize_int8(
    df: DataFrame, id_col: str, vec_col: str, scale_digits: int = 8
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an ``array<float>``
    embedding column — the storage/serving compression step of an
    embedding lake (4× smaller than float32, dot products stay in
    integer SIMD). Per vector: ``q_i = round(x_i / s)`` with
    ``s = max|x| / 127`` (zero vectors get s = 1 so they quantize to
    zeros instead of dividing by zero). Output:
    (id, scale, qvec: array<int>, max_abs_err, mse) — the error stats
    make the quantization loss auditable per row (|err| ≤ s/2 by
    construction).

    Everything is per-row array HOF math (transform/zip_with/aggregate)
    — zero shuffles, zero UDFs; the operator is a pure map at any
    scale. Element order in the error reduction is the array order, so
    results are bit-deterministic. The derived arrays materialize
    through single-element explode barriers (see kmeans_assign):
    withColumn chains collapse into one Project, inlining each
    interpreted HOF into every downstream reference (measured 1.22 s →
    0.84 s at x10 with _v/_q/err barriered; the remainder is the
    irreducible per-row HOF work).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mid1 = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct(
                    v.alias("v"),
                    F.array_max(F.transform(v, F.abs)).alias("amax"),
                )
            )
        ).alias("_st1"),
    )
    vv = F.col("_st1").getField("v")
    amax = F.col("_st1").getField("amax")
    s = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / 127.0)
    df3 = mid1.select(
        F.col(id_col),
        vv.alias("_v"),
        F.explode(
            F.array(
                F.struct(
                    s.alias("s"),
                    F.transform(
                        vv, lambda x: F.round(x / s).cast("int")
                    ).alias("q"),
                )
            )
        ).alias("_st2"),
    ).select(
        F.col(id_col),
        F.col("_v"),
        F.col("_st2").getField("s").alias("_s"),
        F.col("_st2").getField("q").alias("_q"),
    )
    err = F.zip_with(
        F.col("_v"), F.col("_q"), lambda x, q: x - q * F.col("_s")
    )
    df4 = df3.select(
        F.col(id_col),
        F.col("_s"),
        F.col("_q"),
        F.size(F.col("_v")).alias("_n"),
        F.explode(F.array(err)).alias("_err"),
    )
    return df4.select(
        F.col(id_col),
        F.round(F.col("_s"), scale_digits).alias("scale"),
        F.col("_q").alias("qvec"),
        F.round(
            F.array_max(F.transform(F.col("_err"), F.abs)), scale_digits
        ).alias("max_abs_err"),
        F.round(
            F.when(
                F.col("_n") > 0,
                F.aggregate(F.col("_err"), F.lit(0.0), lambda a, e: a + e * e)
                / F.col("_n"),
            ),
            scale_digits,
        ).alias("mse"),
    )


def random_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    dim: int,
    seed: int = 42,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection of an ``array<float>``
    embedding column to ``out_dim`` dimensions — the cheap dimension
    reduction in front of clustering / visualization / coarse ANN when
    the full embedding is overkill. Output: (id, proj: array<double>).

    The projection matrix is the repo's deterministic LCG unit
    hyperplanes (same generator as the LSH family), packed into ONE
    literal; each output coordinate folds
    ``zip_with(vec, slice(H, j·dim+1, dim))`` — the whole operator is a
    single map-stage expression, no shuffle, no UDF, analysis cost
    independent of ``out_dim``.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector
    from kubernetes_logs_datalake_spark.operators.similarity import _hyperplanes

    flat: list[float] = []
    for p in _hyperplanes(dim, out_dim, seed):
        flat.extend(p)
    H = literal_vector(flat)
    vec = F.col(vec_col)

    proj = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                vec,
                F.slice(H, j * dim + 1, dim),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    return df.select(F.col(id_col), proj.alias("proj"))

def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    scale: int = 6,
) -> DataFrame:
    """(id, cluster, dist) — nearest-centroid assignment against a
    plan-time-constant centroid set. The centroid matrix is ONE packed
    literal; per row the k squared distances are HOF folds and the
    argmin is array_position of the min — a pure map stage, no shuffle,
    no UDF. Ties break to the lowest cluster index.

    The distance array materializes through a single-element explode (a
    Generate node): CollapseProject would otherwise inline the k-fold
    distance expression into all three downstream references
    (array_position + two array_min), and HOF folds are interpreted, so
    the k·dim work would run 3× per row (measured 1.04 s → 0.40 s at
    x10 for the barrier; results bit-identical)."""
    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector

    k = len(centroids)
    dim = len(centroids[0])
    flat: list[float] = []
    for c in centroids:
        if len(c) != dim:
            raise ValueError("ragged centroid matrix")
        flat.extend(float(v) for v in c)
    C = literal_vector(flat)
    vec = F.col(vec_col)
    d2 = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                vec,
                F.slice(C, j * dim + 1, dim),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    return df.select(
        F.col(id_col),
        vec.alias("_v"),
        F.explode(F.array(d2)).alias("_d2"),
    ).select(
        F.col(id_col),
        (F.array_position(F.col("_d2"), F.array_min(F.col("_d2"))) - 1)
        .cast("int")
        .alias("cluster"),
        float_round(F.sqrt(F.array_min(F.col("_d2"))), scale).alias("dist"),
        F.col("_v").alias(vec_col),
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 4,
    scale: int = 6,
    fit_sample_mod: int | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Deterministic distributed Lloyd's k-means over an
    ``array<float>`` column. Returns (centroids, assignments) where
    assignments is (id, cluster, dist).

    - **Init**: the k rows with the smallest ``md5(id)`` — the repo's
      engine-portable pseudo-random pick (no rand(), stable run to run).
    - **Iterate**: assignment is the map-only :func:`kmeans_assign`
      against broadcast-literal centroids; the update is
      :func:`label_centroids`'s exact-DECIMAL element-wise mean (one
      (cluster, pos)-keyed partial-agg shuffle, perfectly balanced at
      k·dim keys regardless of skew), rounded to ``scale`` so every
      iteration's centroids — and therefore the final assignment — are
      bit-deterministic across partitionings.
    - **Driver traffic**: k·dim doubles per iteration (the new
      centroids), never the data. Empty clusters keep their previous
      centroid.

    An iterative algorithm by nature (each Lloyd step is a fixpoint
    round); the per-iteration plan is shuffle-minimal, so cost is
    iters × (one scan + one k·dim-key shuffle).

    - **Sampled fit** (``fit_sample_mod=m``, m>1): Lloyd runs on the
      deterministic ``xxhash64(id) mod m == 0`` sample (seeds included);
      only the FINAL assignment scans the full corpus. This is what
      keeps the fit O(n) when k itself grows with the corpus (the √n
      cells rule): with k ≈ √n and a sample of ~40·√n rows, fit cost
      is iters·40·√n·k·dim = O(iters·n·dim) instead of the
      iters·n·k·dim = O(n^1.5) a full-corpus fit would pay — and the
      full-corpus n·k·dim term is paid exactly once, at assignment.
      Same design (and same hash) as ``graph.auto_time_bucket``'s
      ``sample_mod``; ``fit_sample_mod=None``/1 is the exact
      full-corpus fit, bit-identical to the pre-r10 behavior, which is
      why every hash-checked oracle resolves to it at sandbox SFs.
    """
    if fit_sample_mod is not None and fit_sample_mod < 1:
        raise ValueError(f"fit_sample_mod must be >= 1, got {fit_sample_mod}")
    # The iterations re-read the working set iters+1 times — cache the
    # two needed columns for their duration (the standard Spark shape
    # for Lloyd's; MEMORY_AND_DISK so a huge corpus spills instead of
    # OOMing). The returned assignment is built on the uncached input
    # so it stays valid after unpersist.
    from pyspark import StorageLevel

    fit_src = df
    if fit_sample_mod and fit_sample_mod > 1:
        fit_src = df.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(fit_sample_mod)) == 0
        )
    work = fit_src.select(F.col(id_col), F.col(vec_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        seeds = (
            work.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(k)
            .collect()
        )
        centroids = [[float(v) for v in r[1]] for r in seeds]
        if len(centroids) < k:
            raise ValueError(f"need at least k={k} rows, got {len(centroids)}")
        for _ in range(iters):
            assigned = kmeans_assign(work, id_col, vec_col, centroids, scale=scale)
            new = {
                int(r[0]): [float(v) for v in r[2]]
                for r in label_centroids(assigned, "cluster", vec_col, scale=scale,
                                         portable_round=True)
                .select("cluster", "n_vectors", "centroid")
                .collect()
            }
            centroids = [new.get(j, centroids[j]) for j in range(k)]
    finally:
        work.unpersist()
    return centroids, kmeans_assign(df, id_col, vec_col, centroids, scale=scale)


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    scale: int = 6,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``m`` contiguous subspaces, learn a ``k``-centroid codebook per
    subspace with the deterministic :func:`kmeans_fit`, and encode every
    vector as ``m`` small codes — the compression half of IVF-PQ, the
    storage format billion-vector ANN serves from (m=4, k=16 stores a
    64-dim float vector in 4 nibbles; distances against codes become
    table lookups).

    Output: (id, code_0..code_{m-1}, recon_err) where recon_err is the
    L2 distance to the reconstructed (codebook-concatenated) vector —
    the auditable quantization loss, exactly like quantize_int8's
    error columns.

    Plan: codebook learning is m independent ``kmeans_fit`` runs over
    the sliced column (iters × one k·subdim-keyed shuffle each, k·subdim
    doubles of driver traffic); the ENCODE pass is a single map-only
    select — per subspace the k squared distances are HOF folds against
    one packed codebook literal and the code is argmin — so the
    corpus-wide encode costs one scan regardless of m·k. Deterministic:
    centroids are rounded to ``scale`` every iteration (kmeans_fit) and
    ties break to the lowest code, so the oracle unrolls per-subspace
    chains of the same CTEs.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector

    if codebooks is None:
        codebooks = pq_codebooks(df, id_col, vec_col, dim, m, k, iters, scale)
    _validate_codebooks(codebooks, dim, m, k)
    subdim = dim // m
    mid = _subspace_d2_struct(
        df, [F.col(id_col)], F.col(vec_col), codebooks, subdim
    )
    cols: list[F.Column] = [F.col(id_col)]
    total_d2 = None
    for s in range(m):
        d2 = F.col("_d2s").getField(f"d{s}")
        cols.append(
            (F.array_position(d2, F.array_min(d2)) - 1)
            .cast("int")
            .alias(f"code_{s}")
        )
        md2 = F.array_min(d2)
        total_d2 = md2 if total_d2 is None else total_d2 + md2
    cols.append(float_round(F.sqrt(total_d2), scale).alias("recon_err"))
    return mid.select(*cols)


def _subspace_d2_struct(df, keep, vec_expr, codebooks, subdim):
    """Materialize every subspace's k-distance array through ONE
    single-element explode (a Generate node). CollapseProject would
    otherwise inline each interpreted k-fold distance expression into
    its 2-3 downstream references (argmin + min + error sum), tripling
    the per-row fold work — the same pathology and fix as
    :func:`kmeans_assign`'s barrier. Returns ``keep`` columns plus a
    ``_d2s`` struct with one ``d<s>`` array field per subspace; field
    reads downstream are attribute access, evaluated once."""
    from kubernetes_logs_datalake_spark.functions.vectors import (
        literal_vector,
    )

    def make_d2(sub, C, k):
        # separate scope per subspace: a plain loop lambda would
        # capture the loop variables late, and default-arg binding
        # would change the lambda's arity for the HOF resolver
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.aggregate(
                F.zip_with(
                    sub,
                    F.slice(C, j * subdim + 1, subdim),
                    lambda x, c: (x.cast("double") - c)
                    * (x.cast("double") - c),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )

    fields = []
    for s, cents in enumerate(codebooks):
        C = literal_vector([float(v) for c in cents for v in c])
        sub = F.slice(vec_expr, s * subdim + 1, subdim)
        fields.append(make_d2(sub, C, len(cents)).alias(f"d{s}"))
    return df.select(
        *keep, F.explode(F.array(F.struct(*fields))).alias("_d2s")
    )


def _validate_codebooks(codebooks, dim: int, m: int, k: int) -> None:
    """Shape-check explicit codebooks: the HOF folds silently ignore
    length overhangs (zip_with stops at the shorter side), so a wrong
    m/dim/k would truncate dimensions into WRONG results, not errors."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if len(codebooks) != m:
        raise ValueError(f"{len(codebooks)} codebooks != m {m}")
    subdim = dim // m
    for s, book in enumerate(codebooks):
        if len(book) != k:
            raise ValueError(f"codebook {s} has {len(book)} centroids != k {k}")
        for c in book:
            if len(c) != subdim:
                raise ValueError(
                    f"codebook {s} centroid length {len(c)} != dim/m {subdim}"
                )


def pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    scale: int = 6,
) -> list[list[list[float]]]:
    """The m per-subspace codebooks behind :func:`pq_encode` /
    :func:`pq_adc_topk` — m deterministic kmeans_fit runs over the
    sliced column (shared seeds: smallest md5(id) rows)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    subdim = dim // m
    books = []
    for s in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * subdim + 1, subdim).alias("_sub"),
        )
        cents, _ = kmeans_fit(sub, id_col, "_sub", k=k, iters=iters, scale=scale)
        books.append(cents)
    return books


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    topk: int = 10,
    scale: int = 6,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k (the ADC half of IVF-PQ, Jégou et
    al. 2011 §III): the query stays un-quantized; each corpus vector's
    approximate distance is a sum of m TABLE LOOKUPS — the per-subspace
    distances from the query slice to every codebook entry, computed
    ONCE driver-side (m·k doubles) and shipped as packed literals.

    Per row: m argmin folds (the encode) + m element_at lookups + one
    TakeOrderedAndProject for the top-k — a single map stage over the
    corpus with O(k·dim) driver traffic total, the billion-scale serving
    shape (no full-precision distance is ever computed corpus-side).
    Output: (id, adc_dist), ascending, ties by id.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector

    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != dim {dim}")
    if codebooks is None:
        codebooks = pq_codebooks(df, id_col, vec_col, dim, m, k, iters, scale)
    _validate_codebooks(codebooks, dim, m, k)
    subdim = dim // m
    mid = _subspace_d2_struct(
        df, [F.col(id_col)], F.col(vec_col), codebooks, subdim
    )
    dist_total = None
    for s, cents in enumerate(codebooks):
        qsub = query[s * subdim : (s + 1) * subdim]
        # ADC lookup table: ||q_sub - c_j||² for every code, computed in
        # Python with the same left-to-right position fold as the oracle
        adc = [
            sum((qi - ci) * (qi - ci) for qi, ci in zip(qsub, c))
            for c in cents
        ]
        A = literal_vector([float(v) for v in adc])
        d2 = F.col("_d2s").getField(f"d{s}")
        code = F.array_position(d2, F.array_min(d2))  # 1-based
        term = F.element_at(A, code.cast("int"))
        dist_total = term if dist_total is None else dist_total + term
    return (
        mid.select(
            F.col(id_col), F.round(dist_total, scale).alias("adc_dist")
        )
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


def pq_index_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    scale: int = 6,
) -> list[list[list[float]]]:
    """Persist a PQ index: codebooks as JSON (k·dim doubles — driver
    state, exactly what kmeans_fit already ships) plus the encoded
    corpus as parquet codes. Build once, serve many — the index
    lifecycle :func:`pq_index_search` reads, so query latency never
    pays codebook training again. The code table is ~dim/m× smaller
    than the embeddings (4 int codes vs 64 floats here), which is the
    point: the serving scan reads codes only, never the vectors.

    Returns the codebooks (also written to ``<index_dir>/codebooks.json``
    with the (dim, m, k) config for load-time validation).

    Manifest I/O goes through the Hadoop FileSystem seam (r12 verdict
    item 2): ``index_dir`` may be ``file:/``, ``hdfs://`` or
    ``s3a://`` — the manifest lands on the SAME filesystem as the
    codes, with the invalidate→write→rename torn-build order intact.
    Driver-POSIX ``open()``/``os.replace`` would silently misroute the
    manifest to the driver's local disk on a remote lake — the exact
    deployment the build-once/serve-many index exists for.
    """
    import json as _json

    books = pq_codebooks(df, id_col, vec_col, dim, m, k, iters, scale)
    codes = pq_encode(
        df, id_col, vec_col, dim, m, k, iters, scale, codebooks=books
    )
    # codes first, manifest last — and the manifest lands by atomic
    # rename, so neither a torn FIRST build (no manifest yet) nor a
    # torn REBUILD (old manifest would otherwise pair with new codes)
    # ever leaves a manifest that matches stale codes. A rebuild that
    # crashes between the codes overwrite and the rename still leaves
    # the OLD manifest against NEW codes — so the codes path is
    # versioned into the manifest write order: invalidate first.
    fs = _index_fs(df.sparkSession, index_dir)
    manifest = f"{index_dir}/codebooks.json"
    cfg = {"dim": dim, "m": m, "k": k, "scale": scale,
           "id_col": id_col, "vec_col": vec_col, "codebooks": books}
    if fs.exists(manifest):
        # invalidate BEFORE touching codes; a crashed REBUILD is not
        # repairable (codes may be half-overwritten against either
        # codebook) but the old codebooks survive in the sidecar for
        # forensics — repair refuses op="build" and says to rebuild
        old = _json.loads(fs.read_small(manifest))
        _invalidate_manifest(fs, manifest, old, op="build")
    codes.write.mode("overwrite").parquet(f"{index_dir}/codes")
    _commit_manifest(fs, manifest, cfg)
    return books


def pq_index_append(
    df: DataFrame,
    index_dir: str,
    skip_existing_ids: bool = False,
    checkpoint_dir: str | None = None,
) -> int:
    """Append new vectors to a stored PQ index without refitting:
    encode the batch against the manifest's frozen codebooks and
    append the code rows. Unlike the IVF,SQ8 layout (raw vectors,
    serve-time encode), the PQ index stores CODES — but a frozen
    codebook makes old and new codes directly comparable, so append is
    one encode pass + one parquet append, no invalidation of existing
    rows. Crash-survivable torn protocol as in
    :func:`ivf_sq8_index_append`: the codebooks are preserved in a
    ``.torn`` sidecar before the manifest is invalidated, and a torn
    index found on entry self-heals via :func:`pq_index_repair`.
    Codebook drift is the accepted trade-off, as in
    :func:`ivf_sq8_index_append`. Returns rows appended.

    ``skip_existing_ids=True`` makes the append IDEMPOTENT per id
    (ADVICE r13): the batch anti-joins against the stored codes' id
    column (a column-pruned read — m tinyints per row are never
    decoded), so an at-least-once replay after a crash between the
    codes append and the manifest rewrite appends 0 instead of
    silently duplicating code rows (duplicated ids would surface in
    :func:`pq_index_search` results). Off by default — the guard costs
    one pruned scan of the whole code table per append (the PQ layout
    is not cell-partitioned, so unlike the IVF,SQ8 guard it cannot
    partition-prune), and exactly-once upstreams shouldn't pay it.

    ``checkpoint_dir`` routes the batch pin through the reliable
    checkpointer (:func:`operators.lineage.truncate_lineage`) so an
    executor loss mid-append recomputes instead of failing the job —
    the 100 TB availability posture; ``None`` keeps the local path."""
    import json as _json

    from kubernetes_logs_datalake_spark.operators.lineage import (
        truncate_lineage,
    )

    spark = df.sparkSession
    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/codebooks.json"
    if not fs.exists(manifest) and fs.exists(_torn(manifest)):
        pq_index_repair(spark, index_dir)  # self-heal a torn index
    _refuse_torn(fs, manifest, "pq_index_append")
    meta = _json.loads(fs.read_small(manifest))
    books, m, k, dim, scale = (
        meta["codebooks"], meta["m"], meta["k"], meta["dim"],
        meta["scale"],
    )
    id_col = meta.get("id_col", "vec_id")
    vec_col = meta.get("vec_col", "embedding")
    codes = truncate_lineage(
        pq_encode(
            df, id_col, vec_col, dim, m, k, iters=0, scale=scale,
            codebooks=books,
        ),
        checkpoint_dir, eager=True,
    )
    if skip_existing_ids:
        existing = spark.read.parquet(f"{index_dir}/codes").select(id_col)
        codes = truncate_lineage(
            codes.join(existing, id_col, "left_anti"),
            checkpoint_dir, eager=True,
        )
    n_new = codes.count()
    if n_new == 0:
        return 0
    _invalidate_manifest(fs, manifest, meta, op="append")
    codes.write.mode("append").parquet(f"{index_dir}/codes")
    _commit_manifest(fs, manifest, meta)
    return n_new


def pq_index_repair(spark, index_dir: str) -> dict:
    """Restore a PQ index torn by a crash inside an append's
    manifest-invalidation window (r13 verdict item 2). The append
    never deletes code files, so after any crash the code table is
    either the old content or old+batch (parquet appends commit per
    job) — both valid against the FROZEN codebooks preserved in the
    ``.torn`` sidecar. Repair is therefore just: restore the manifest
    from the sidecar, O(1). A torn (re)BUILD is refused: its codes may
    be half-overwritten against either codebook — rebuild instead (the
    old codebooks stay in the sidecar for forensics).

    Returns ``{"repaired": bool, "status"/"op": ...}``; raises
    FileNotFoundError when there is nothing to repair."""
    import json as _json

    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/codebooks.json"
    torn = _torn(manifest)
    if fs.exists(manifest):
        cleaned = fs.exists(torn)
        if cleaned:
            fs.delete(torn)  # dangling sidecar from a crash post-commit
        return {"repaired": False, "status": "healthy",
                "cleaned_sidecar": cleaned}
    if not fs.exists(torn):
        raise FileNotFoundError(
            f"pq_index_repair: neither manifest nor sidecar at {manifest}"
            " — nothing to repair (index was never built)"
        )
    sidecar = _json.loads(fs.read_small(torn))
    op = sidecar.get("op", "unknown")
    if op != "append":
        raise RuntimeError(
            f"pq_index_repair: torn '{op}' protocol is not repairable — "
            f"a crashed (re)build may have half-overwritten the codes; "
            f"rebuild with pq_index_build (old codebooks preserved in "
            f"{torn})"
        )
    _commit_manifest(fs, manifest, sidecar["cfg"])
    return {"repaired": True, "op": op}


def _index_fs(spark, index_dir: str):
    """The driver-side Hadoop FileSystem seam shared with the lake
    compactor (``sources/compact._Fs``): exists/delete/read/atomic-
    write that behave identically on file://, hdfs:// and s3a://.
    Index manifests MUST go through this — not ``os``/``open()`` —
    or on a remote lake the manifest lands on the driver's local disk
    while the parquet halves land remotely, tearing the very build
    the manifest protocol guards."""
    from kubernetes_logs_datalake_spark.sources.compact import _Fs

    return _Fs(spark, index_dir)


def _invalidate_manifest(fs, manifest: str, cfg: dict, op: str,
                         **extra) -> None:
    """Crash-SURVIVABLE manifest invalidation (r13 verdict item 2).

    The r13 protocol deleted the manifest outright before mutating
    data, so a crash inside the mutation window destroyed the ONLY
    copy of the codebook/centroids — for append/compact a pure loss,
    since the cfg is byte-identical before and after, and the only
    recovery was a full O(n) refit. Now the cfg is first preserved in
    a ``<manifest>.torn`` sidecar (atomic write, plus the op name and
    whatever the repair path needs — e.g. compact's pre-counts), and
    only THEN is the manifest deleted. Every crash point is safe:

    - before the delete: manifest + sidecar both present, data
      untouched — the manifest stays authoritative and the next
      lifecycle commit removes the dangling sidecar;
    - inside the mutation: manifest absent, sidecar present — serving
      still REFUSES (unchanged posture), but
      :func:`ivf_sq8_index_repair` / :func:`pq_index_repair` can
      restore the index in O(touched data), and the append/compact
      entry points self-heal on finding the sidecar;
    - after the commit, before the sidecar cleanup: manifest (new)
      + sidecar both present — manifest authoritative again.
    """
    import json as _json

    sidecar = {"op": op, "cfg": cfg}
    sidecar.update(extra)
    fs.write_small_atomic(_torn(manifest), _json.dumps(sidecar).encode())
    fs.delete(manifest)


def _commit_manifest(fs, manifest: str, cfg: dict) -> None:
    """Publish the manifest (atomic rename) and clear the torn
    sidecar — the commit half of :func:`_invalidate_manifest`."""
    import json as _json

    fs.write_small_atomic(manifest, _json.dumps(cfg).encode())
    torn = _torn(manifest)
    if fs.exists(torn):
        fs.delete(torn)


def _torn(manifest: str) -> str:
    return manifest + ".torn"


@contextmanager
def _conf_override(spark, key: str, value: str):
    """Set a session conf for the duration of a block, then restore it
    EXACTLY — including the unset state (ADVICE r13: ``conf.get(key,
    None)`` returns None for an unset key, and restoring only when a
    previous value existed left the session permanently in the
    override; a later ``ivf_sq8_index_build`` overwrite under a
    lingering ``partitionOverwriteMode=dynamic`` would then replace
    only the clusters present in the new assignment, serving stale
    cells under a fresh manifest)."""
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


def ivf_sq8_index_publish(
    spark, index_dir: str, serve_root: str, keep_snapshots: int = 2
) -> dict:
    """Zero-refusal serving for the stored IVF,SQ8 index: publish an
    immutable SNAPSHOT copy and flip a pointer — the
    ``sources/compact.py`` rename-publish idiom applied to the index
    artifact. The live index refuses (correctly) while a lifecycle
    mutation is in flight; a serving fleet that cannot tolerate that
    window serves from ``resolve_serving_index(serve_root)`` instead,
    which always resolves a COMPLETE snapshot:

    - snapshots land under ``serve_root/snapshots/snap-<n>`` with the
      data (cells, bounds) copied FIRST and the snapshot's
      ``manifest.json`` copied LAST — the manifest doubles as the
      completeness marker, so a crash mid-copy leaves a manifest-less
      partial that readers never see and the next publish sweeps;
    - the ``CURRENT`` pointer is an atomic tmp+rename write
      (``_Fs.write_small_atomic``), so readers see the old snapshot or
      the new one, never a torn pointer;
    - the previous ``keep_snapshots`` complete snapshots are retained
      (an in-flight query on the just-replaced snapshot keeps reading
      files that still exist); older ones and manifest-less partials
      are deleted.

    The copy itself is a driver-side Hadoop ``FileUtil.copy`` — right
    for the sandbox and for indexes up to tens of GB; a 100 TB
    deployment swaps this one seam for distcp/S3 batch copy and keeps
    the marker-last + pointer-flip protocol unchanged. Publishing a
    TORN index refuses (repair first). Returns
    ``{"snapshot", "pruned"}``."""
    import json as _json
    import re as _re

    fs = _index_fs(spark, index_dir)
    src_manifest = f"{index_dir}/manifest.json"
    _refuse_torn(fs, src_manifest, "ivf_sq8_index_publish")
    sfs = _index_fs(spark, serve_root)
    snaps_dir = f"{serve_root}/snapshots"

    def _snap_ids() -> list[int]:
        out = []
        for p in sfs.glob(f"{snaps_dir}/snap-*"):
            m = _re.search(r"snap-(\d+)$", p)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    ids = _snap_ids()
    nxt = (ids[-1] + 1) if ids else 1
    snap = f"{snaps_dir}/snap-{nxt}"
    # data first, marker (manifest) LAST
    for part in ("cells", "bounds"):
        if fs.exists(f"{index_dir}/{part}"):
            sfs.copy(f"{index_dir}/{part}", f"{snap}/{part}")
    sfs.copy(src_manifest, f"{snap}/manifest.json")
    sfs.write_small_atomic(
        f"{serve_root}/CURRENT",
        _json.dumps({"snapshot": f"snap-{nxt}"}).encode(),
    )
    # prune: manifest-less partials always; complete snapshots beyond
    # the retention window, never the one CURRENT names
    pruned = []
    complete = []
    for sid in _snap_ids():
        p = f"{snaps_dir}/snap-{sid}"
        if not sfs.exists(f"{p}/manifest.json"):
            if sid != nxt:
                sfs.delete(p)
                pruned.append(f"snap-{sid}")
        else:
            complete.append(sid)
    for sid in complete[:-keep_snapshots] if keep_snapshots > 0 else []:
        if sid != nxt:
            sfs.delete(f"{snaps_dir}/snap-{sid}")
            pruned.append(f"snap-{sid}")
    return {"snapshot": f"snap-{nxt}", "pruned": pruned}


def resolve_serving_index(spark, serve_root: str) -> str:
    """The reader half of :func:`ivf_sq8_index_publish`: follow
    ``CURRENT`` to the snapshot directory and verify its completeness
    marker. The returned path serves through the ordinary
    :func:`ivf_sq8_index_search` — and keeps serving, untouched, while
    the LIVE index runs appends/compactions/repairs."""
    import json as _json

    sfs = _index_fs(spark, serve_root)
    cur = f"{serve_root}/CURRENT"
    if not sfs.exists(cur):
        raise FileNotFoundError(
            f"resolve_serving_index: no CURRENT pointer under "
            f"{serve_root} — nothing published yet"
        )
    name = _json.loads(sfs.read_small(cur))["snapshot"]
    snap = f"{serve_root}/snapshots/{name}"
    if not sfs.exists(f"{snap}/manifest.json"):
        raise FileNotFoundError(
            f"resolve_serving_index: CURRENT names {name} but its "
            "completeness marker is missing — publish was torn AFTER "
            "the pointer flip, which the marker-last order makes "
            "impossible unless the snapshot was deleted by hand; "
            "re-publish from the live index"
        )
    return snap


def _refuse_torn(fs, manifest: str, fn: str) -> None:
    """Shared refusal for read paths: missing manifest raises, and the
    message says whether a repairable torn sidecar exists."""
    if fs.exists(manifest):
        return
    if fs.exists(_torn(manifest)):
        raise FileNotFoundError(
            f"{fn}: manifest missing but {_torn(manifest)} exists — the "
            "index is TORN (crash inside a lifecycle mutation); run the "
            "matching index_repair() to restore it"
        )
    raise FileNotFoundError(
        f"{fn}: no manifest at {manifest} — incomplete or torn index build"
    )


def pq_index_search(
    spark,
    index_dir: str,
    query: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve an ADC top-k from a persisted PQ index: m·k lookup tables
    computed driver-side from the saved codebooks, one map-only scan of
    the CODE table (no vectors read), TakeOrdered top-k. Output:
    (id, adc_dist) ascending, ties by id — identical semantics to
    :func:`pq_adc_topk` but with the codebook training amortized away
    and the scan reading m small ints per row instead of dim floats.
    """
    import json as _json

    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector

    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/codebooks.json"
    _refuse_torn(fs, manifest, "pq_index_search")
    meta = _json.loads(fs.read_small(manifest))
    books, m, dim, scale = (
        meta["codebooks"], meta["m"], meta["dim"], meta["scale"]
    )
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != index dim {dim}")
    subdim = dim // m
    codes = spark.read.parquet(f"{index_dir}/codes")
    dist_total = None
    for s, cents in enumerate(books):
        qsub = query[s * subdim : (s + 1) * subdim]
        adc = [
            sum((qi - ci) * (qi - ci) for qi, ci in zip(qsub, c))
            for c in cents
        ]
        A = literal_vector([float(v) for v in adc])
        term = F.element_at(A, F.col(f"code_{s}") + 1)
        dist_total = term if dist_total is None else dist_total + term
    return (
        codes.select(
            F.col(id_col), F.round(dist_total, scale).alias("adc_dist")
        )
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


def pq_refine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    n_candidates: int = 50,
    topk: int = 10,
    scale: int = 4,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Two-stage PQ serving: ADC candidate generation then EXACT
    re-rank (the refine step of IVFADC-R, Jégou et al. 2011 §V) —
    the production answer to PQ's quantization error: scan the corpus
    with cheap table lookups, then spend full-precision distance only
    on ``n_candidates`` survivors.

    Output: (id, cos), the exact-cosine top-``topk`` of the ADC
    candidate set, descending, ties by id.

    Plan: the ADC stage is the map-only scan + TakeOrderedAndProject
    of :func:`pq_adc_topk`; its ≤``n_candidates``-row result joins
    back to the corpus by id (AQE broadcasts the tiny candidate side,
    so the corpus never shuffles) and one more TakeOrdered emits the
    refined top-k. Total full-precision work: ``n_candidates`` rows,
    independent of corpus size — the 100 TB property. Recall is the
    ADC stage's (refine can only reorder survivors); size
    ``n_candidates``/``topk`` by the measured recall curve.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import (
        cosine,
        literal_vector,
    )

    cands = pq_adc_topk(
        df,
        id_col,
        vec_col,
        query,
        dim=dim,
        m=m,
        k=k,
        iters=iters,
        topk=n_candidates,
        scale=6,
        codebooks=codebooks,
    ).select(id_col)
    qlit = literal_vector([float(v) for v in query])
    return (
        df.join(cands, id_col)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), scale).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(topk)
    )


def ivfadc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    n_centroids: int = 8,
    n_probe: int = 4,
    m: int = 4,
    k: int = 16,
    coarse_iters: int = 3,
    pq_iters: int = 2,
    topk: int = 10,
    scale: int = 6,
    centers: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Full IVFADC (Jégou et al. 2011 §IV): coarse k-means quantizer +
    product quantization OF THE RESIDUALS + per-probe asymmetric
    distance tables — the complete billion-scale index this repo's IVF
    (cell pruning) and PQ (ADC over raw vectors) pieces compose into.
    Residual encoding is what makes PQ codes small enough to matter:
    residuals concentrate near 0, so k codes cover them far better
    than they cover raw vectors.

    Plan, in 100 TB terms: training = one deterministic coarse k-means
    (k·dim driver doubles/iteration) + m residual-subspace k-means;
    the serving scan touches only the ``n_probe`` probed cells
    (persisted as a partition key, probes become partition pruning),
    reads m codes per row, and sums m table lookups — the lookup
    tables are (n_probe · m · k) driver-computed doubles shipped as
    literals, built from (query − probed-centroid) residuals. No
    full-precision distance is ever computed corpus-side; stack
    :func:`pq_refine_topk`'s exact re-rank on the survivors for the
    serving-quality path.

    Deterministic end to end (md5 init, decimal centroid means, rounded
    every iteration, ties to the lowest index), so the DuckDB oracle
    replays the identical coarse chain, residual chains, probe pick,
    and lookup-sum. Output: (id, adc_dist) ascending, ties by id.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector

    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != dim {dim}")
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if centers is None:
        centers, _ = kmeans_fit(
            df, id_col, vec_col, k=n_centroids, iters=coarse_iters,
            scale=scale,
        )
    if len(centers) != n_centroids:
        raise ValueError(
            f"{len(centers)} centers != n_centroids {n_centroids}"
        )
    asg = kmeans_assign(df, id_col, vec_col, centers, scale=scale)
    # residuals: one map stage against the packed coarse-centroid
    # literal (index arithmetic, not a join)
    Cflat = literal_vector([float(v) for c in centers for v in c])
    vec = F.col(vec_col)
    res = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.element_at(vec, i.cast("int")).cast("double")
        - F.element_at(Cflat, (F.col("cluster") * dim + i).cast("int")),
    )
    # single-element explode barrier (see kmeans_assign): the residual
    # transform must materialize once, not re-run per downstream
    # subspace-slice reference
    resdf = asg.select(
        F.col(id_col), F.col("cluster"), F.explode(F.array(res)).alias("_res")
    )
    books = (
        codebooks
        if codebooks is not None
        else pq_codebooks(resdf, id_col, "_res", dim, m, k, pq_iters, scale)
    )
    _validate_codebooks(books, dim, m, k)

    def sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = sorted(range(n_centroids), key=lambda i: sqd(query, centers[i]))[
        :n_probe
    ]
    subdim = dim // m
    probed = resdf.filter(F.col("cluster").isin([int(p) for p in probe]))
    mid = _subspace_d2_struct(
        probed,
        [F.col(id_col), F.col("cluster")],
        F.col("_res"),
        books,
        subdim,
    )
    # 1-based index of the row's cell within the probe list
    probe_arr = F.array(*[F.lit(int(p)) for p in probe])
    pidx = F.array_position(probe_arr, F.col("cluster"))
    dist_total = None
    for s in range(m):
        cents = books[s]
        d2 = F.col("_d2s").getField(f"d{s}")
        code = F.array_position(d2, F.array_min(d2))  # 1-based
        # per-probe lookup table: ||(q - coarse_p)_sub − c_j||², same
        # left-to-right position fold as the oracle's list_sum
        table = []
        for p in probe:
            qres = [query[i] - centers[p][i] for i in range(dim)]
            qsub = qres[s * subdim : (s + 1) * subdim]
            for c in cents:
                table.append(
                    float(sum((qi - ci) * (qi - ci) for qi, ci in zip(qsub, c)))
                )
        A = literal_vector(table)
        term = F.element_at(A, ((pidx - 1) * k + code).cast("int"))
        dist_total = term if dist_total is None else dist_total + term
    return (
        mid.select(
            F.col(id_col), F.round(dist_total, scale).alias("adc_dist")
        )
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


def ivfadc_refine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    n_centroids: int = 8,
    n_probe: int = 4,
    m: int = 4,
    k: int = 16,
    coarse_iters: int = 3,
    pq_iters: int = 2,
    n_candidates: int = 50,
    topk: int = 10,
    scale: int = 4,
    centers: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVFADC-R (Jégou et al. 2011 §V): the full IVFADC index for
    candidate generation, then EXACT cosine re-rank of the
    ``n_candidates`` survivors — the serving-quality composition.
    Raw ADC ordering is bounded by residual-PQ quantization error
    (measured on the clustered fixture: recall@10 ≈ 0.17–0.22 across
    n_probe 1→8 — the codes rank noise-level neighbors, not resolve
    them); the refine stage spends full precision on a fixed candidate
    count, independent of corpus size, and recovers the recall the
    curve in SCALE.md records (≥0.9 at the registered defaults).

    Plan: ivfadc_topk's probed-cells scan + TakeOrdered emits
    ≤ n_candidates ids; that tiny side joins back to the corpus by id
    (AQE broadcasts it — the corpus never shuffles) and one more
    TakeOrdered yields (id, cos) descending, ties by id.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import (
        cosine,
        literal_vector,
    )

    cands = ivfadc_topk(
        df,
        id_col,
        vec_col,
        query,
        dim=dim,
        n_centroids=n_centroids,
        n_probe=n_probe,
        m=m,
        k=k,
        coarse_iters=coarse_iters,
        pq_iters=pq_iters,
        topk=n_candidates,
        scale=6,
        centers=centers,
        codebooks=codebooks,
    ).select(id_col)
    qlit = literal_vector([float(v) for v in query])
    return (
        df.join(cands, id_col)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), scale).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(topk)
    )


def sq8_bounds(df: DataFrame, vec_col: str, dim: int) -> tuple[list, list]:
    """Per-dimension (min, max) over the corpus in ONE aggregate of
    2·dim expressions (element_at — no explode, so the training pass
    never shuffles n·dim rows; map-side combine reduces to one 2·dim
    row). The collected bounds are 2·dim doubles — a bounded driver
    fetch, same contract as the k-means centroid collect."""
    v = F.col(vec_col)
    aggs = []
    for i in range(1, dim + 1):
        e = F.element_at(v, i).cast("double")
        aggs.append(F.min(e).alias(f"mn{i}"))
        aggs.append(F.max(e).alias(f"mx{i}"))
    row = df.agg(*aggs).first()
    mins = [float(row[f"mn{i}"]) for i in range(1, dim + 1)]
    maxs = [float(row[f"mx{i}"]) for i in range(1, dim + 1)]
    return mins, maxs


def sq8_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bounds: tuple[list, list] | None = None,
) -> DataFrame:
    """Scalar 8-bit quantization (SQ8): code_i = ⌊(v_i − min_i)·255 /
    (max_i − min_i)⌋ clamped to [0, 255] — the 4×-smaller,
    lower-distortion sibling of PQ for serving fleets that can afford
    1 byte/dim (PQ when they can't). Codes are exact integer outputs
    of one floor, so the DuckDB oracle reproduces them bit-for-bit.

    Map-only: the per-dim mins/scales ship as two packed literals; a
    constant dim can't collapse (max==min) without the expression
    emitting code 0 via the scale guard. Output: (id, codes array<int>).
    """
    mins, maxs = bounds if bounds is not None else sq8_bounds(df, vec_col, dim)
    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector

    Mn = literal_vector(mins)
    # scale_i = 255 / (max_i − min_i); 0 for a constant dimension so
    # every vector codes to 0 there (no information, no crash)
    scales = [
        (255.0 / (mx - mn)) if mx > mn else 0.0
        for mn, mx in zip(mins, maxs)
    ]
    Sc = literal_vector(scales)
    v = F.col(vec_col)
    codes = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.least(
            F.greatest(
                F.floor(
                    (v[(i - F.lit(1)).cast("int")].cast("double")
                     - F.element_at(Mn, i.cast("int")))
                    * F.element_at(Sc, i.cast("int"))
                ),
                F.lit(0),
            ),
            F.lit(255),
        ).cast("int"),
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def sq8_pack(
    df: DataFrame, id_col: str, codes_col: str = "codes",
    dim: int | None = None,
) -> DataFrame:
    """Pack SQ8 ``array<int>`` codes into a 1-byte/dim ``binary``
    column — the storage/shuffle representation for a serving fleet.
    An int array carries ~16 B/dim in flight (4 B value + offsets +
    validity) for 1 B/dim of information; the packed binary is exactly
    ``dim`` bytes. Pure expression work (hex + lpad + concat_ws +
    unhex), whole-stage codegen, no Python. Output: (id, packed).

    Pass ``dim`` to guard the representation (r9 ADVICE): ``concat_ws``
    silently SKIPS NULL elements, so a NULL code would shorten the blob
    below ``dim`` bytes and shift every later dimension's substring
    decode — plausible-but-wrong scores instead of NULLs. With ``dim``
    set, a NULL codes array packs to NULL, and a ragged or
    NULL-element array raises instead of mis-packing.
    """
    codes = F.col(codes_col)
    packed = F.unhex(
        F.concat_ws(
            "",
            F.transform(codes, lambda c: F.lpad(F.hex(c), 2, "0")),
        )
    )
    if dim is not None:
        packed = (
            F.when(codes.isNull(), F.lit(None).cast("binary"))
            .when(
                (F.size(codes) == dim)
                & ~F.exists(codes, lambda c: c.isNull()),
                packed,
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"sq8_pack: codes must be {dim} non-NULL ints, "
                            "got a ragged or NULL-element array for id "
                        ),
                        F.col(id_col).cast("string"),
                    )
                ).cast("binary")
            )
        )
    return df.select(F.col(id_col), packed.alias("packed"))


def sq8_score_packed(
    df: DataFrame,
    id_col: str,
    query: list[float],
    dim: int,
    bounds: tuple[list, list],
    topk: int = 10,
    scale: int = 6,
    packed_col: str = "packed",
) -> DataFrame:
    """Score a STORED packed-codes frame (``id, packed: binary``)
    against a full-precision query — the serving leg of
    :func:`sq8_topk_packed` without the encode leg, for fleets that
    persist the packed codes once and serve many queries. ``bounds``
    must be the train-time per-dim (mins, maxs) the codes were encoded
    with. Same flat unrolled decode+dot expression as
    ``sq8_topk_packed`` (one 1-byte substring per dim, whole-stage
    codegen, sequential-fold-identical sum), so scores are
    bit-identical to the encode-in-query path and the two share one
    oracle. Output: (id, score) descending, ties by id.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import sql_double

    mins, maxs = bounds
    inv = [
        ((mx - mn) / 255.0) if mx > mn else 0.0
        for mn, mx in zip(mins, maxs)
    ]
    # SQL-text twin of the unrolled byte-decode·query sum (r15):
    # identical flat left-associative tree, one JVM parse instead of
    # ~10 py4j round-trips per dimension (see sql_double)
    score = F.expr(
        " + ".join(
            f"{sql_double(float(query[i - 1]))} * "
            f"({sql_double(mins[i - 1])} + "
            f"CAST(conv(hex(substring(`{packed_col}`, {i}, 1)), 16, 10)"
            f" AS DOUBLE) * {sql_double(inv[i - 1])})"
            for i in range(1, dim + 1)
        )
    )
    return (
        df.select(F.col(id_col), F.round(score, scale).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(topk)
    )


def sq8_topk_packed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    topk: int = 10,
    scale: int = 6,
    bounds: tuple[list, list] | None = None,
) -> DataFrame:
    """SQ8 asymmetric top-k over PACKED binary codes — the scale path
    of :func:`sq8_topk`. Codes ride as ``dim`` bytes/row (vs ~16·dim
    for ``array<int>``); scoring unpacks on read with a 1-byte binary
    substring per dimension (hex+conv of one byte) inside a FLAT
    unrolled sum — never a higher-order-function fold. A HOF lambda is
    interpreted, and projection collapse inlines the whole encode+pack
    expression into every lambda body, re-evaluating it per dimension
    (measured 5.2 s → 0.3 s warm at x10 for the unroll). The flat
    left-to-right sum is IEEE-identical to the sequential fold
    (0.0 + t₁ = t₁), so scores stay bit-identical to :func:`sq8_topk`
    and the two share one DuckDB oracle.
    """
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != dim {dim}")
    mins, maxs = bounds if bounds is not None else sq8_bounds(df, vec_col, dim)
    enc = sq8_pack(
        sq8_encode(df, id_col, vec_col, dim, bounds=(mins, maxs)), id_col,
        dim=dim,
    )
    return sq8_score_packed(
        enc, id_col, query, dim, (mins, maxs), topk=topk, scale=scale
    )


def sq8_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    topk: int = 10,
    scale: int = 6,
    bounds: tuple[list, list] | None = None,
) -> DataFrame:
    """SQ8 asymmetric top-k: score each row's CODES against the
    full-precision query (decode-in-expression: v̂_i = min_i +
    code_i/scale_i) with a FLAT left-to-right unrolled sum — the same
    accumulation order as a sequential fold (so the double sum is
    order-deterministic and the oracle replays it) without a
    higher-order-function lambda: HOF lambdas are interpreted and
    projection collapse inlines the encode expression into each lambda
    body, re-evaluating it per dimension (see sq8_topk_packed for the
    measured cost). Serving reads dim bytes/row conceptually (here an
    int array; sq8_pack/sq8_topk_packed is the packed-byte layout).
    Output: (id, score) descending dot product, ties by id.
    """
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != dim {dim}")
    import functools
    import operator as _op

    mins, maxs = bounds if bounds is not None else sq8_bounds(df, vec_col, dim)
    enc = sq8_encode(df, id_col, vec_col, dim, bounds=(mins, maxs))
    inv = [
        ((mx - mn) / 255.0) if mx > mn else 0.0
        for mn, mx in zip(mins, maxs)
    ]
    from kubernetes_logs_datalake_spark.functions.vectors import sql_double

    # SQL-text twin of the unrolled decode·query sum (r15): identical
    # flat left-associative tree, one JVM parse instead of ~8 py4j
    # round-trips per dimension (see sql_double)
    score = F.expr(
        " + ".join(
            f"{sql_double(float(query[i - 1]))} * "
            f"({sql_double(mins[i - 1])} + "
            f"CAST(element_at(codes, {i}) AS DOUBLE)"
            f" * {sql_double(inv[i - 1])})"
            for i in range(1, dim + 1)
        )
    )
    return (
        enc.select(F.col(id_col), F.round(score, scale).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(topk)
    )


def sq8_cell_bounds(
    assigned: DataFrame,
    vec_col: str,
    dim: int,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Per-CELL per-dimension SQ8 quantization bounds — the clustered-
    corpus fix for scalar quantization's one measured failure mode.

    Global SQ8 bounds give every dimension one 8-bit grid over the
    whole corpus range; on a clustered corpus (the realistic regime —
    SCALE.md's organic Gaussian-mixture panel) within-component
    neighbor margins fall below the global 8-bit step and recall
    collapses (panel recall@10 0.986 uniform → 0.116 organic ×10 →
    0.073 ×20, SCALE.md round 12). Training bounds PER IVF CELL shrinks
    each grid to the cell's local range, so the same 8 bits resolve the
    margins that actually matter — the standard locally-adaptive
    refinement of SQ (per-cell/per-block scalar quantization, the SQ
    analog of IVFADC's residual idea).

    Input is any frame carrying ``cluster_col`` (the coarse-quantizer
    assignment, ``kmeans_assign``) and ``vec_col``. One groupBy
    aggregate of 2·dim expressions per cell — map-side combined to
    cells·2·dim values, never an n·dim explode — then the per-dim
    ``mn`` (min), ``sc`` (encode scale 255/(mx−mn)) and ``iv`` (decode
    inverse (mx−mn)/255) arrays are assembled per cell. A constant
    dimension WITHIN a cell gets sc=iv=0, so every member decodes to
    exactly ``mn`` — per-cell bounds quantize locally-constant
    dimensions losslessly, which is precisely where the global grid
    wasted its codes. Output: (cluster, mn, sc, iv) — cells rows, a
    broadcastable dim-scaled frame, never collected to the driver.
    """
    # SQL-text twins (r15): identical trees to the Column-API
    # constructions they replaced, ~6 py4j round-trips per dim saved
    # on the aggs and per array element (see sql_double's note)
    mn_aggs = [
        F.expr(
            f"min(CAST(element_at(`{vec_col}`, {i}) AS DOUBLE)) AS _mn{i}"
        )
        for i in range(1, dim + 1)
    ]
    mx_aggs = [
        F.expr(
            f"max(CAST(element_at(`{vec_col}`, {i}) AS DOUBLE)) AS _mx{i}"
        )
        for i in range(1, dim + 1)
    ]
    agg = assigned.groupBy(cluster_col).agg(*mn_aggs, *mx_aggs)
    mn = F.expr(
        "array(%s)" % ",".join(f"_mn{i}" for i in range(1, dim + 1))
    )
    sc = F.expr(
        "array(%s)"
        % ",".join(
            f"CASE WHEN _mx{i} > _mn{i}"
            f" THEN 255.0D / (_mx{i} - _mn{i}) ELSE 0.0D END"
            for i in range(1, dim + 1)
        )
    )
    iv = F.expr(
        "array(%s)"
        % ",".join(
            f"CASE WHEN _mx{i} > _mn{i}"
            f" THEN (_mx{i} - _mn{i}) / 255.0D ELSE 0.0D END"
            for i in range(1, dim + 1)
        )
    )
    return agg.select(
        F.col(cluster_col),
        mn.alias("mn"),
        sc.alias("sc"),
        iv.alias("iv"),
    )


def sq8_cell_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    topk: int = 10,
    scale: int = 6,
    centers: list[list[float]] | None = None,
    cells: int = 8,
    iters: int = 3,
    bounds_df: DataFrame | None = None,
    assign_arrow: bool = False,
) -> DataFrame:
    """SQ8 asymmetric top-k with PER-CELL bounds (:func:`sq8_cell_bounds`)
    — same serving contract as :func:`sq8_topk` (score codes against a
    full-precision query, (id, score) descending, ties by id), but the
    8-bit grid adapts to each IVF cell's local range instead of the
    global corpus range, recovering the recall that global SQ8 loses on
    clustered corpora (SCALE.md round 12 panel numbers).

    Plan shape: one map-only coarse assignment (``kmeans_assign``
    against plan-literal centroids), one broadcast hash join against
    the cells-row bounds frame (explicitly ``F.broadcast`` — cells·3·dim
    doubles, a few MB even at 100 TB's √n cells), then the decode+dot
    as ONE sequential ``F.aggregate`` fold over the joined bound
    arrays (see ``_sq8_cell_score``: the r12 rewrite — an O(1)
    expression tree instead of the O(dim) unrolled projection whose
    driver-side Column construction + 64-term codegen cost a measured
    6.9 s/run vs 0.9 s; the fold's interpreted data path is safe here
    because every operand is a join-provided array lookup referenced
    once, so projection collapse cannot re-evaluate it — the
    sq8_topk_packed hazard doesn't apply), no shuffle before the final
    top-k. Fold order is left-to-right, IEEE-identical to DuckDB's
    sequential ``list_sum``, so the oracle hash-checks values. Encode scale is computed IN-ENGINE on both
    sides (255/(mx−mn) as a column expression here, the same division
    in the oracle CTE) — bit-identical double ops, no driver float
    round-trip.

    ``bounds_df`` lets a serving fleet reuse a persisted bounds frame;
    ``centers`` skips the Lloyd fit (the shared-cache contract of the
    IVF family).
    """
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != dim {dim}")
    if centers is None:
        centers, _ = kmeans_fit(df, id_col, vec_col, k=cells, iters=iters)
    # assign_arrow: the bit-identical numpy scan (kmeans_assign_arrow)
    # for deployments where the assignment dominates the serve path;
    # expression default keeps the plan python-free
    assigned = (
        kmeans_assign_arrow(df, id_col, vec_col, centers)
        if assign_arrow
        else kmeans_assign(df, id_col, vec_col, centers)
    )
    if bounds_df is None:
        # the assignment feeds BOTH the bounds agg and the join side —
        # truncate so the dominant n·k·dim scan runs once, not once
        # per reference (the one-materialization idiom; r12 review)
        assigned = assigned.localCheckpoint(eager=False)
        bounds_df = sq8_cell_bounds(assigned, vec_col, dim)
    return _sq8_cell_score(
        assigned, id_col, vec_col, query, dim, topk, scale, bounds_df
    )


def _sq8_cell_score(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    topk: int,
    scale: int,
    bounds_df: DataFrame,
) -> DataFrame:
    """Scoring tail shared by :func:`sq8_cell_topk` (full scan) and
    :func:`ivf_sq8_topk` (probed scan): broadcast-join the per-cell
    bounds onto a (id, vec, cluster) frame and rank the sequential
    decode+dot fold. One tail, two probe regimes — a fix here cannot
    diverge them.

    The bounds join is a LEFT join with an in-expression raise on a
    null hit (r12 ADVICE): an inner join would silently DROP every row
    whose cluster has no bounds row — a stale or foreign ``bounds_df``
    from a serving caller would quietly shrink recall instead of
    erroring. The raise lives in the lazy branch of a CASE WHEN on the
    score column, so covered rows pay one null check and the error
    fires on the first uncovered row the executor touches."""
    joined = assigned.join(F.broadcast(bounds_df), "cluster", "left")
    from kubernetes_logs_datalake_spark.functions.vectors import (
        literal_vector,
    )

    Q = literal_vector([float(x) for x in query])
    v = F.col(vec_col)
    mn = F.col("mn")
    sc = F.col("sc")
    iv = F.col("iv")

    # ONE sequential HOF fold (0.0 + t₁ + t₂ …) instead of a dim-wide
    # unrolled sum: the accumulation order — and therefore the rounded
    # double — is IEEE-identical (the oracle's list_sum replays it),
    # but the expression tree is O(1) instead of O(dim). The unrolled
    # form paid ~4 s of driver-side Column construction (≈15 py4j
    # round-trips × dim) plus codegen of a 64-term projection EVERY
    # run — measured 6.9 s/run at sf0.1 vs 0.9 s for this form, and
    # the fold's interpreted data path is NOT the bottleneck here
    # because every per-element operand is a plain array lookup on
    # join-provided columns, referenced once (no collapse-inlined
    # re-evaluation, the sq8_topk_packed hazard).
    def _term(acc, i):
        code = F.least(
            F.greatest(
                F.floor(
                    (F.element_at(v, i.cast("int")).cast("double")
                     - F.element_at(mn, i.cast("int")))
                    * F.element_at(sc, i.cast("int"))
                ),
                F.lit(0),
            ),
            F.lit(255),
        ).cast("int")
        return acc + F.element_at(Q, i.cast("int")) * (
            F.element_at(mn, i.cast("int"))
            + code.cast("double") * F.element_at(iv, i.cast("int"))
        )

    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)), F.lit(0.0), _term
    )
    score = F.when(
        mn.isNull(),
        F.raise_error(F.lit(
            "sq8 bounds_df does not cover every assigned cluster — "
            "stale or foreign bounds frame passed to the serving path"
        )),
    ).otherwise(fold)
    return (
        joined.select(F.col(id_col), F.round(score, scale).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(topk)
    )


def ivf_sq8_index_search_many(
    spark,
    index_dir: str,
    queries: DataFrame,
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    topk: int = 10,
    n_probe: int = 1,
) -> DataFrame:
    """BATCHED serve over the stored IVF,SQ8 index — the production
    shape when queries arrive as a frame (offline re-ranking, nightly
    kNN refresh, eval panels), where per-query driver round-trips
    (:func:`ivf_sq8_index_search` in a loop) would pay one Spark job
    per query. One plan serves the whole batch:

    - queries are rotated IN-PLAN through the manifest's R when the
      index is an OPQ composition (``rotation.rotate_vector_expr`` —
      the sequential HOF fold, bit-identical to the single-query
      path's driver-side matvec, NOT the GEMM which reorders sums);
    - probes replay :func:`_pick_probes` in-plan: per (query,
      centroid) the same sequential-sum L2 with the same (d2, index)
      tie-break, rank ≤ ``n_probe`` over a BROADCAST centroid frame
      — no shuffle of the query side;
    - the union of probed clusters (bounded by the cell count) is
      collected driver-side and filters the cells scan — STATIC
      partition pruning, same as the single-query serve; only probed
      partitions are listed or decoded;
    - the (query × probed-cell) pairing is a broadcast join of the
      query-probe frame (n_queries × n_probe rows) onto the pruned
      cells — the corpus never shuffles; per-candidate scoring
      replays ``_sq8_cell_score``'s exact decode+dot op sequence with
      the query read from the broadcast column instead of a literal,
      so every (query, row) score is bit-identical to the
      single-query serve;
    - per-query top-k via a rank window partitioned by query id (the
      only shuffle, carrying id+score+qid — never vectors).

    Pytest pins batched ≡ per-query-loop bit-identity on both raw and
    rotated indexes. Sized for serving batches up to ~1M queries (the
    broadcast is n_queries × n_probe small rows); beyond that,
    partition the batch. Returns (qid, id, score) with scores rounded
    exactly as the single-query path rounds them."""
    import json as _json

    from pyspark.sql import Window

    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/manifest.json"
    _refuse_torn(fs, manifest, "ivf_sq8_index_search_many")
    cfg = _json.loads(fs.read_small(manifest))
    dim = int(cfg["dim"])
    scale = int(cfg["scale"])
    id_col, vec_col = cfg["id_col"], cfg["vec_col"]
    centers = cfg["centers"]
    if n_probe < 1 or n_probe > len(centers):
        raise ValueError(
            f"n_probe must be in [1, {len(centers)}], got {n_probe}"
        )

    q = queries.select(
        F.col(qid_col).alias("_qid"), F.col(qvec_col).alias("_qv")
    )
    if "rotation" in cfg:
        from kubernetes_logs_datalake_spark.operators.rotation import (
            rotate_vector_expr,
        )

        q = q.select("_qid", rotate_vector_expr("_qv", cfg["rotation"])
                     .alias("_qv"))

    cents = spark.createDataFrame(
        [(int(j), [float(v) for v in c]) for j, c in enumerate(centers)],
        "cluster int, _c array<double>",
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("_qv"), F.col("_c"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    probe_rank = F.row_number().over(
        Window.partitionBy("_qid").orderBy(F.col("_d2"), F.col("cluster"))
    )
    probes = (
        q.join(F.broadcast(cents))
        .select("_qid", "_qv", "cluster", d2.alias("_d2"))
        .withColumn("_pr", probe_rank)
        .filter(F.col("_pr") <= n_probe)
        .select("_qid", "_qv", "cluster")
        .localCheckpoint(eager=True)  # pin: feeds the driver cut + join
    )
    probed_clusters = sorted(
        int(r["cluster"])
        for r in probes.select("cluster").distinct().collect()
    )
    cells = spark.read.parquet(f"{index_dir}/cells").filter(
        F.col("cluster").isin(probed_clusters)
    )
    bounds = spark.read.parquet(f"{index_dir}/bounds")
    joined = (
        cells.join(F.broadcast(probes), "cluster")
        .join(F.broadcast(bounds), "cluster", "left")
    )

    v = F.col(vec_col)
    mn, sc, iv = F.col("mn"), F.col("sc"), F.col("iv")

    # _sq8_cell_score._term verbatim, with the query element read from
    # the broadcast _qv column — same ops, same order, same rounding
    def _term(acc, i):
        code = F.least(
            F.greatest(
                F.floor(
                    (F.element_at(v, i.cast("int")).cast("double")
                     - F.element_at(mn, i.cast("int")))
                    * F.element_at(sc, i.cast("int"))
                ),
                F.lit(0),
            ),
            F.lit(255),
        ).cast("int")
        return acc + F.element_at(F.col("_qv"), i.cast("int")) * (
            F.element_at(mn, i.cast("int"))
            + code.cast("double") * F.element_at(iv, i.cast("int"))
        )

    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)), F.lit(0.0), _term
    )
    score = F.when(
        mn.isNull(),
        F.raise_error(F.lit(
            "sq8 bounds do not cover every probed cluster — stale or "
            "foreign bounds under the served index"
        )),
    ).otherwise(fold)
    ranked = joined.select(
        F.col("_qid").alias(qid_col),
        F.col(id_col),
        F.round(score, scale).alias("score"),
    ).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(qid_col)
            .orderBy(F.desc("score"), F.col(id_col))
        ),
    )
    return ranked.filter(F.col("_rk") <= topk).drop("_rk")


def sq8_cell_refine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    topk: int = 10,
    n_candidates: int = 40,
    n_probe: int | None = None,
    cells: int = 8,
    iters: int = 3,
    scale: int = 4,
    centers: list[list[float]] | None = None,
    bounds_df: DataFrame | None = None,
    assigned_df: DataFrame | None = None,
) -> DataFrame:
    """Two-stage SQ8 funnel — quantized candidate generation, EXACT
    cosine re-rank (``IVF,SQ8-R``; the refine idiom of
    :func:`pq_refine_topk` / Jégou et al. 2011 §V applied to the
    per-cell SQ8 scorer): the SCALE.md r12 deployment rule's answer
    for corpora where per-cell bounds DON'T pay (effective-bits
    statistic small, e.g. the measured 1.76 bits on the organic
    corpus — and the r13 rotation A/B showing no orthonormal rotation
    recovers it). Quantization error then can't be sized away with a
    finer grid, so spend full precision on ``n_candidates`` survivors
    instead: recall becomes the CANDIDATE stage's recall@n_candidates
    (strictly ≥ recall@topk, monotone in n_candidates), while
    full-precision work stays ``n_candidates`` rows regardless of
    corpus size — the 100 TB property.

    ``n_probe=None`` scans all cells through :func:`sq8_cell_topk`;
    an int probes that many cells through :func:`ivf_sq8_topk`
    (candidate recall then also gated by the probe cut). The ≤
    ``n_candidates``-row survivor frame joins back to the corpus by
    id — AQE broadcasts it, the corpus never shuffles. Output:
    (id, cos) exact cosine, descending, ties by id."""
    from kubernetes_logs_datalake_spark.functions.vectors import (
        cosine,
        literal_vector,
    )

    if n_probe is None:
        cands = sq8_cell_topk(
            df, id_col, vec_col, query, dim, topk=n_candidates,
            centers=centers, cells=cells, iters=iters,
            bounds_df=bounds_df,
        ).select(id_col)
    else:
        cands = ivf_sq8_topk(
            df, id_col, vec_col, query, dim, topk=n_candidates,
            n_probe=n_probe, cells=cells, iters=iters, centers=centers,
            bounds_df=bounds_df, assigned_df=assigned_df,
        ).select(id_col)
    qlit = literal_vector([float(v) for v in query])
    return (
        df.join(cands, id_col)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), scale).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(topk)
    )


def kmeans_assign_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    scale: int = 6,
) -> DataFrame:
    """Arrow-batched numpy twin of :func:`kmeans_assign` — the scale
    path for the one term that dominates every IVF-family operator at
    100 TB: the n·k·dim nearest-centroid scan. The expression form runs
    as interpreted higher-order folds (k·dim lambda steps per row); this
    form runs the same arithmetic as k·dim VECTORIZED numpy ops per
    Arrow batch (C speed, one op across the whole batch), measured ~10×
    faster at ×10 scale (SCALE.md r12).

    BIT-EXACT by construction, not by luck: for each centroid the
    accumulator starts at 0.0 and adds (vᵢ−cᵢ)² in dimension order —
    vectorized ACROSS ROWS, so every row's scalar accumulation sequence
    is IEEE-identical to the ``aggregate``-fold's; ``np.argmin`` takes
    the FIRST minimum (the ``array_position`` low-index tie-break), and
    the dist rounding replays ``float_round``'s floor(x·10^s + 0.5)/10^s
    op sequence. A pytest pins full-frame equality against
    ``kmeans_assign`` on the sandbox corpus, so either path can serve
    any consumer interchangeably. Default consumers keep the expression
    path (whole-stage codegen, zero Python in the plan — the PLAN_AUDIT
    invariant); flip this in when the assignment scan is the measured
    bottleneck and a python_eval stage is acceptable.
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    k = len(centroids)
    dim = len(centroids[0])
    C = []
    for c in centroids:
        if len(c) != dim:
            raise ValueError("ragged centroid matrix")
        C.append([float(v) for v in c])
    Cnp = np.asarray(C, dtype=np.float64)
    p10 = float(10**scale)

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType([
        in_fields[id_col],
        # nullable: a NULL input vector yields a NULL cluster/dist row,
        # matching the expression path's behavior
        StructField("cluster", IntegerType(), True),
        StructField("dist", DoubleType(), True),
        StructField(vec_col, in_fields[vec_col].dataType,
                    in_fields[vec_col].nullable),
    ])

    def assign_batches(batches):
        for b in batches:
            names = b.schema.names
            idc = b.column(names.index(id_col))
            vc = b.column(names.index(vec_col))
            n = b.num_rows
            if n == 0:
                continue
            # NULL vectors mirror the expression path — a NULL cluster/
            # dist row, NOT an error: the "either path serves any
            # consumer interchangeably" contract includes failure
            # behavior (r12 review). Ragged NON-null rows still raise
            # loudly (the expression path would silently mis-slice).
            valid = np.ones(n, dtype=bool)
            if vc.null_count:
                valid = ~vc.is_null().to_numpy(zero_copy_only=False)
            offs = np.diff(vc.offsets.to_numpy())
            if not (offs[valid] == dim).all():
                raise ValueError(
                    f"kmeans_assign_arrow: ragged {vec_col} "
                    f"(expected {dim} elements per row)"
                )
            nv = int(valid.sum())
            cl_out = np.zeros(n, dtype=np.int32)
            dist_out = np.zeros(n, dtype=np.float64)
            if nv:
                flat = (
                    vc.flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64, copy=False)
                )
                # flatten() drops NULL slots, so the flat values are
                # exactly the valid rows' elements in order
                V = flat.reshape(nv, dim)
                D = np.empty((nv, k), dtype=np.float64)
                for j in range(k):
                    acc = np.zeros(nv, dtype=np.float64)
                    for i in range(dim):
                        t = V[:, i] - Cnp[j, i]
                        acc += t * t
                    D[:, j] = acc
                cl = np.argmin(D, axis=1)
                mind = D[np.arange(nv), cl]
                cl_out[valid] = cl.astype(np.int32)
                dist_out[valid] = np.floor(np.sqrt(mind) * p10 + 0.5) / p10
            mask = None if valid.all() else ~valid
            yield pa.RecordBatch.from_arrays(
                [
                    idc,
                    pa.array(cl_out, type=pa.int32(), mask=mask),
                    pa.array(dist_out, type=pa.float64(), mask=mask),
                    vc,
                ],
                names=[id_col, "cluster", "dist", vec_col],
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        assign_batches, out_schema
    )


def _pick_probes(
    query: list[float], centers: list[list[float]], n_probe: int
) -> list[int]:
    """Driver-side probe pick shared by :func:`ivf_sq8_topk` and
    :func:`ivf_sq8_index_search`: the ``n_probe`` nearest centroid
    INDICES by (sequential-sum L2, index) — the tie-break the DuckDB
    oracle's ``ORDER BY qd2, j`` replays, kept in ONE place so the
    bit-identical served≡inline contract has a single divergence
    surface (r12 review)."""
    if n_probe < 1 or n_probe > len(centers):
        raise ValueError(
            f"n_probe must be in [1, {len(centers)}], got {n_probe}"
        )

    def _sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    return sorted(
        range(len(centers)), key=lambda i: (_sqd(query, centers[i]), i)
    )[:n_probe]


def ivf_sq8_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    dim: int,
    topk: int = 10,
    n_probe: int = 1,
    cells: int = 8,
    iters: int = 3,
    scale: int = 6,
    centers: list[list[float]] | None = None,
    bounds_df: DataFrame | None = None,
    assigned_df: DataFrame | None = None,
    assign_arrow: bool = False,
) -> DataFrame:
    """IVF + per-cell SQ8 serving index — the classic ``IVF,SQ8``
    composition (the FAISS naming) that completes this repo's serving
    matrix: :func:`ivf_topk` prunes cells but scores full-precision
    vectors, :func:`ivfadc_topk` prunes cells and scores PQ residual
    codes, :func:`sq8_cell_topk` scores SQ8 codes but scans the whole
    corpus. This one does both cuts at once: only the ``n_probe``
    nearest cells are scanned (probe pick is the ``ivfadc_topk``
    driver-side idiom — n_probe·cells L2s over the centroid list, no
    Spark job), and inside them each row costs one per-cell SQ8
    decode+dot (1 byte/dim conceptually; the encode-in-expression form
    here, :func:`sq8_pack` for the stored-byte layout).

    At 100 TB the two cuts multiply: scan fraction ≈ n_probe/cells of
    the corpus (cells as a partition key makes the probe filter
    partition PRUNING, the ivfadc posture) × ~1/8 the bytes per row
    vs float64. Scores are EXACTLY :func:`sq8_cell_topk`'s for the
    probed rows (same assignment, same per-cell bounds, same
    sequential fold), so at ``n_probe == cells`` the output is
    bit-identical to the full scan — the exact-at-full-probe contract
    (pytest-pinned), and the DuckDB oracle composes the per-cell SQ8
    chain with the probe ``IN`` filter. Recall-vs-probe is measured,
    not assumed (SCALE.md). Output: (id, score) descending, ties by id.

    LIFECYCLE MATTERS for the scan cut (measured, SCALE.md r12): with
    only a raw ``df`` the operator must assign EVERY row to find its
    cell before filtering, so the n·cells·dim assignment scan — the
    family's dominant term — is paid on the whole corpus and the probe
    filter saves almost nothing. The serve-many path passes
    ``assigned_df`` (the stored (id, vec, cluster) frame an index
    build writes once, cell-partitioned so the probe filter becomes
    partition pruning) together with ``bounds_df``; then a query costs
    ~n_probe/cells of the fold scan and no assignment at all — the
    pq_index_build/pq_index_search lifecycle, applied to SQ8.
    """
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != dim {dim}")
    if centers is None:
        if assigned_df is not None:
            # refitting a codebook from `df` while probing cells whose
            # labels came from a DIFFERENT (unknown) codebook would
            # probe arbitrary cells with no error to catch it — the
            # mismatched-codebook hazard. The stored lifecycle always
            # has the pair (manifest carries the centers); in-memory
            # callers must pass the codebook that produced the labels.
            raise ValueError(
                "assigned_df requires the `centers` codebook that "
                "produced its cluster labels (the index-build artifact "
                "pair); refusing to refit from df"
            )
        centers, _ = kmeans_fit(df, id_col, vec_col, k=cells, iters=iters)
    probe = _pick_probes(query, centers, n_probe)
    if assigned_df is not None:
        # CONTRACT: assigned_df's cluster labels must come from the
        # SAME codebook as `centers` (the index-build artifact pair) —
        # the probe pick is by centroid index, so mismatched labels
        # probe arbitrary cells with no error to catch it. The stored
        # lifecycle (ivf_sq8_index_search) enforces this by reading
        # centers from the index manifest; in-memory callers own it.
        if "cluster" not in assigned_df.columns:
            raise ValueError(
                "assigned_df must carry the 'cluster' column from "
                "kmeans_assign over the index codebook"
            )
        assigned = assigned_df
        if bounds_df is None:
            # one-materialization idiom: the frame feeds both the
            # bounds agg and the probed join side
            assigned = assigned.localCheckpoint(eager=False)
            bounds_df = sq8_cell_bounds(assigned, vec_col, dim)
    else:
        assigned = (
            kmeans_assign_arrow(df, id_col, vec_col, centers)
            if assign_arrow
            else kmeans_assign(df, id_col, vec_col, centers)
        )
        if bounds_df is None:
            # bounds train on the FULL corpus (they are an index-build
            # artifact shared across queries, not a per-probe product);
            # truncate so the assignment scan feeds bounds + filter once
            assigned = assigned.localCheckpoint(eager=False)
            bounds_df = sq8_cell_bounds(assigned, vec_col, dim)
    probed = assigned.filter(
        F.col("cluster").isin([int(p) for p in probe])
    )
    return _sq8_cell_score(
        probed, id_col, vec_col, query, dim, topk, scale, bounds_df
    )


def ivf_sq8_index_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    dim: int,
    cells: int = 8,
    iters: int = 3,
    scale: int = 6,
    centers: list[list[float]] | None = None,
    assign_arrow: bool = False,
    rotation: list[list[float]] | None = None,
    rotation_in_plan: bool = False,
) -> list[list[float]]:
    """Persist an IVF,SQ8 index with the layout that makes the probe
    cut REAL: the assigned corpus written ``partitionBy(cluster)`` (so
    a serve-time probe filter is PARTITION PRUNING — only n_probe of
    cells directories are ever listed or read), the per-cell bounds as
    a small parquet, and the centroids + config as a JSON manifest
    with :func:`pq_index_build`'s torn-build-safe write order
    (invalidate manifest → write data → atomic-rename manifest).
    Build once, serve many via :func:`ivf_sq8_index_search` — the
    measured 6× serve-path cut at ×10 (SCALE.md r12), with the scan
    fraction scaling as n_probe/cells on top at lake scale. Returns
    the centroids."""
    import json as _json

    if rotation is not None:
        # OPQ-style pre-transform as a build-once index artifact (the
        # FAISS "OPQ..,IVF..,SQ8" composition; r13 rotation A/B in
        # SCALE.md for when it pays): rotate the corpus BEFORE the fit
        # and assignment, persist R in the manifest, and the serve
        # path rotates only the QUERY (one dim×dim matvec driver-side)
        # — orthonormality preserves every score, so the output
        # contract is unchanged while the quantizer sees decorrelated
        # coordinates. `centers` passed together with `rotation` must
        # already live in the ROTATED space.
        #
        # rotation_in_plan=False (default): the Arrow GEMM
        # (:func:`rotate_vectors`) — C-speed, the bulk build path.
        # rotation_in_plan=True: the HOF expression form
        # (:func:`rotate_vector_expr`) — slower per row but its
        # left-to-right fold is IEEE-identical to DuckDB's
        # list_sum(list_transform(...)), which makes the STORED
        # rotated lifecycle oracle-checkable bit-for-bit (a GEMM
        # pairwise-reorders the accumulation and drifts in the low
        # bits). Both store the same logical index; pick by whether a
        # hash gate or bulk throughput is watching.
        from kubernetes_logs_datalake_spark.operators.rotation import (
            rotate_vector_expr, rotate_vectors,
        )

        if rotation_in_plan:
            df = df.withColumn(
                vec_col, rotate_vector_expr(vec_col, rotation)
            )
        else:
            df = rotate_vectors(df, vec_col, rotation)
    if centers is None:
        centers, _ = kmeans_fit(df, id_col, vec_col, k=cells, iters=iters)
    assigned = (
        kmeans_assign_arrow(df, id_col, vec_col, centers)
        if assign_arrow
        else kmeans_assign(df, id_col, vec_col, centers)
    ).localCheckpoint(eager=False)
    bounds = sq8_cell_bounds(assigned, vec_col, dim)
    # manifest I/O through the Hadoop FS seam (r12 verdict item 2):
    # same filesystem as the cells on file://, hdfs:// and s3a://,
    # same invalidate→write→rename torn-build order
    fs = _index_fs(df.sparkSession, index_dir)
    manifest = f"{index_dir}/manifest.json"
    if fs.exists(manifest):
        # invalidate BEFORE touching data; a crashed REBUILD is not
        # repairable (cells may be half-overwritten between corpora)
        # but the old centroids survive in the sidecar for forensics
        old = _json.loads(fs.read_small(manifest))
        _invalidate_manifest(fs, manifest, old, op="build")
    # repartition on the partition column BEFORE the partitionBy write
    # (the compaction recipe, applied from day one): without it every
    # shuffle task fans out one file per cluster it holds — measured
    # 2,634 files for 99 cells at ×10 (SCALE.md r14), and at lake
    # scale 10k tasks × 1k cells is a 10M-small-file catastrophe whose
    # listing cost the serve path pays on every query. One file per
    # cell cut the stored serve 790→510 ms in the same measurement.
    # Skewed giant cells are the compaction's problem to split, not a
    # reason to fan out every cell (spark.sql.files.maxRecordsPerFile
    # is the knob if a single cell outgrows one task's write).
    assigned.select(
        F.col(id_col), F.col(vec_col), F.col("cluster")
    ).repartition("cluster").write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(f"{index_dir}/cells")
    bounds.write.mode("overwrite").parquet(f"{index_dir}/bounds")
    payload = {
        "dim": dim, "cells": len(centers), "scale": scale,
        "id_col": id_col, "vec_col": vec_col,
        "centers": [[float(v) for v in c] for c in centers],
    }
    if rotation is not None:
        payload["rotation"] = [[float(v) for v in r] for r in rotation]
    _commit_manifest(fs, manifest, payload)
    return centers


def ivf_sq8_index_append(
    df: DataFrame,
    index_dir: str,
    assign_arrow: bool = False,
    skip_existing_ids: bool = False,
    checkpoint_dir: str | None = None,
) -> int:
    """Append new vectors to a stored IVF,SQ8 index WITHOUT refitting:
    assign the batch against the manifest's frozen codebook, append to
    the cell partitions (only the touched cells' directories gain
    files), and refresh the per-cell bounds for touched cells only —
    untouched cells keep their bounds rows verbatim. Build once,
    append many: the lake-scale ingestion shape, where a daily batch
    is ≪ the corpus and a refit would re-shuffle 100 TB to move a few
    centroids.

    Two properties make the cheap append SOUND here:

    - codes are derived AT SERVE TIME from (vector, bounds) — the
      cells store raw vectors, so widening a touched cell's bounds
      re-encodes its existing rows implicitly; there is no stored-code
      table to invalidate (the classic SQ8-index append hazard).
    - the torn protocol extends naturally AND is crash-SURVIVABLE
      (r13 verdict item 2): the manifest's cfg is preserved in a
      ``.torn`` sidecar before the manifest is invalidated, the data
      mutation runs while serving refuses, and the manifest is
      re-committed (atomic rename) only after cells + bounds are
      consistent. A crash anywhere inside the window leaves a
      refusing-but-REPAIRABLE index — :func:`ivf_sq8_index_repair`
      restores it without a refit, and this function calls it itself
      on finding a torn sidecar, so replayed streaming epochs
      self-heal instead of raising until a full rebuild.

    Centroid drift is the accepted trade-off (the batch is assigned to
    the OLD centroids; recall degrades only as the data distribution
    moves — rebuild when a drift monitor says so, cf.
    :func:`ivf_sq8_index_drift`). Returns the number of rows appended.

    ``skip_existing_ids=True`` makes the append IDEMPOTENT per id: the
    batch anti-joins against the ids already stored in ITS OWN cells
    (a column-pruned, partition-pruned read — only the touched cells'
    id column, never the vectors, never the other cells), so an
    at-least-once replay (the streaming ``foreachBatch`` epoch after a
    crash) appends 0 instead of duplicating rows. Off by default: the
    cost is one extra pruned read per append, and batch callers with
    exactly-once upstream semantics shouldn't pay it.

    ``checkpoint_dir`` routes every lineage pin in the
    read-then-overwrite-same-path steps through the reliable
    checkpointer (:func:`operators.lineage.truncate_lineage`) instead
    of the hard-coded executor-local path (ADVICE r13): at the 100 TB
    posture an executor loss mid-overwrite under localCheckpoint fails
    the job unrecoverably and leaves the index torn until repaired;
    with a reliable dir the lost partitions re-fetch and the append
    completes. ``None`` (default) keeps the sandbox-fast local path."""
    import json as _json

    from kubernetes_logs_datalake_spark.operators.lineage import (
        truncate_lineage,
    )

    spark = df.sparkSession
    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/manifest.json"
    if not fs.exists(manifest) and fs.exists(_torn(manifest)):
        ivf_sq8_index_repair(spark, index_dir)  # self-heal a torn index
    _refuse_torn(fs, manifest, "ivf_sq8_index_append")
    cfg = _json.loads(fs.read_small(manifest))
    id_col, vec_col, dim = cfg["id_col"], cfg["vec_col"], int(cfg["dim"])
    centers = cfg["centers"]
    if "rotation" in cfg:
        from kubernetes_logs_datalake_spark.operators.rotation import (
            rotate_vectors,
        )

        df = rotate_vectors(df, vec_col, cfg["rotation"])
    assigned = truncate_lineage(
        kmeans_assign_arrow(df, id_col, vec_col, centers)
        if assign_arrow
        else kmeans_assign(df, id_col, vec_col, centers),
        checkpoint_dir, eager=True,
    )  # pin: feeds count, write AND bounds
    n_new = assigned.count()
    if n_new == 0:
        return 0
    touched = sorted(
        int(r["cluster"])
        for r in assigned.select("cluster").distinct().collect()
    )
    if skip_existing_ids:
        existing = (
            spark.read.parquet(f"{index_dir}/cells")
            .filter(F.col("cluster").isin(touched))
            .select(id_col)
        )
        assigned = truncate_lineage(
            assigned.join(existing, id_col, "left_anti"),
            checkpoint_dir, eager=True,
        )
        n_new = assigned.count()
        if n_new == 0:
            return 0
        touched = sorted(
            int(r["cluster"])
            for r in assigned.select("cluster").distinct().collect()
        )
    # invalidate BEFORE touching data — cfg survives in the sidecar,
    # with the touched set recorded for a bounded repair
    _invalidate_manifest(fs, manifest, cfg, op="append", touched=touched)
    # repartition the (batch-sized — cheap) epoch on the partition
    # column so each epoch adds ~1 file per touched cell instead of
    # one per (task × cell) — measured ~355 files/epoch without it at
    # ×10 (SCALE.md r14); the serve path pays the listing on every
    # query until compaction catches up
    assigned.select(
        F.col(id_col), F.col(vec_col), F.col("cluster")
    ).repartition("cluster").write.mode("append").partitionBy(
        "cluster"
    ).parquet(f"{index_dir}/cells")
    # bounds: recompute ONLY touched cells from the now-complete cell
    # partitions (partition pruning — the untouched 1 - t/cells of the
    # corpus is never read), keep the rest verbatim
    cells_df = spark.read.parquet(f"{index_dir}/cells")
    new_bounds = sq8_cell_bounds(
        cells_df.filter(F.col("cluster").isin(touched)), vec_col, dim
    )
    old_bounds = spark.read.parquet(f"{index_dir}/bounds").filter(
        ~F.col("cluster").isin(touched)
    )
    merged = truncate_lineage(
        old_bounds.unionByName(new_bounds), checkpoint_dir, eager=True
    )
    merged.write.mode("overwrite").parquet(f"{index_dir}/bounds")
    _commit_manifest(fs, manifest, cfg)
    return n_new


def ivf_sq8_index_verify(spark, index_dir: str) -> dict:
    """Consistency report for a stored IVF,SQ8 index — the check a
    serving fleet runs before taking an index live (and after an
    append): manifest present and parseable, every cell partition's
    cluster id inside the codebook range, and the bounds frame covers
    EVERY cluster the cells contain (the uncovered-cluster condition
    the scorer now raises on, checked here ahead of query time).
    Returns ``{"ok": bool, "n_rows", "n_cells", "uncovered": [...],
    "out_of_range": [...]}``; raises FileNotFoundError on a torn
    build like the search path."""
    import json as _json

    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/manifest.json"
    _refuse_torn(fs, manifest, "ivf_sq8_index_verify")
    cfg = _json.loads(fs.read_small(manifest))
    k = int(cfg["cells"])
    cells_df = spark.read.parquet(f"{index_dir}/cells")
    bounds = spark.read.parquet(f"{index_dir}/bounds")
    present = cells_df.groupBy("cluster").count()
    covered = bounds.select("cluster").distinct()
    uncovered = sorted(
        int(r["cluster"])
        for r in present.join(covered, "cluster", "left_anti")
        .select("cluster").collect()
    )
    out_of_range = sorted(
        int(r["cluster"])
        for r in present.filter(
            (F.col("cluster") < 0) | (F.col("cluster") >= k)
        ).select("cluster").collect()
    )
    stats = present.agg(
        F.sum("count").alias("n"), F.count("*").alias("c")
    ).first()
    return {
        "ok": not uncovered and not out_of_range,
        "n_rows": int(stats["n"] or 0),
        "n_cells": int(stats["c"]),
        "uncovered": uncovered,
        "out_of_range": out_of_range,
    }


def ivf_sq8_index_repair(
    spark, index_dir: str, checkpoint_dir: str | None = None
) -> dict:
    """Restore an IVF,SQ8 index torn by a crash inside a lifecycle
    mutation (r13 verdict item 2) — the availability half of the torn
    protocol: serving correctly REFUSES while the manifest is absent,
    and this turns the refusal from "full O(n) refit" into a bounded
    repair, because :func:`_invalidate_manifest` preserved the cfg
    (centroids, bounds config) in the ``.torn`` sidecar.

    Per torn op:

    - ``append`` — cells only ever GAIN files (parquet append never
      deletes), so the data is old or old+batch — or old+partial-batch
      after a crash mid job-commit, which the per-id replay guard
      completes. The bounds, though, can be stale (cells committed,
      bounds overwrite not started) or DESTROYED (the crash hit inside
      the bounds ``mode("overwrite")``). Repair recomputes the bounds
      for every present cell: :func:`sq8_cell_bounds` is a
      deterministic per-cell min/max, so untouched cells reproduce
      their previous rows bit-identically and touched cells land
      exactly where the uncrashed append would have put them. One
      map-side-combined pass over the cells — the crash path, not the
      hot path (the sidecar's touched set cannot be trusted to bound
      it, because the partial-batch case can leave a touched cell's
      data mid-way between old and new bounds).
    - ``compact`` — the rewrite only moves file layout, but a crash
      mid dynamic-partition-overwrite job-commit can leave a crowded
      cell with old AND new files (duplicated rows) or with rows
      missing. The sidecar recorded the crowded cells and their exact
      pre-count: repair re-counts those cells; equal → layout-only
      difference, restore the manifest; higher → duplicate copies,
      deduplicate by id within the affected cells (rows are identical
      copies, so this is lossless) and rewrite them; lower → data
      LOSS, unrepairable without the corpus — raises.
    - ``build`` — unrepairable by construction (the cells may be
      half-overwritten between two corpora); raises and points at a
      rebuild, with the old centroids still in the sidecar.

    A HEALTHY index (manifest present) is a no-op that clears any
    dangling sidecar left by a crash after the commit. Returns a dict
    with ``repaired`` plus the post-repair :func:`ivf_sq8_index_verify`
    report; raises FileNotFoundError if there is nothing to repair."""
    import json as _json

    from kubernetes_logs_datalake_spark.operators.lineage import (
        truncate_lineage,
    )

    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/manifest.json"
    torn = _torn(manifest)
    if fs.exists(manifest):
        cleaned = fs.exists(torn)
        if cleaned:
            fs.delete(torn)  # dangling sidecar from a crash post-commit
        return {"repaired": False, "status": "healthy",
                "cleaned_sidecar": cleaned}
    if not fs.exists(torn):
        raise FileNotFoundError(
            f"ivf_sq8_index_repair: neither manifest nor sidecar at "
            f"{manifest} — nothing to repair (index was never built)"
        )
    sidecar = _json.loads(fs.read_small(torn))
    op, cfg = sidecar.get("op", "unknown"), sidecar["cfg"]
    if op == "append":
        vec_col, dim = cfg["vec_col"], int(cfg["dim"])
        bounds = truncate_lineage(
            sq8_cell_bounds(
                spark.read.parquet(f"{index_dir}/cells"), vec_col, dim
            ),
            checkpoint_dir, eager=True,
        )
        bounds.write.mode("overwrite").parquet(f"{index_dir}/bounds")
    elif op == "compact":
        crowded = [int(c) for c in sidecar.get("crowded", [])]
        expected = sidecar.get("rows_crowded")
        # a genuine compact sidecar ALWAYS carries both fields
        # (ivf_sq8_index_compact returns early, without invalidating,
        # when nothing is crowded) — a sidecar lacking them is
        # malformed/hand-damaged, and silently restoring the manifest
        # from it would commit an unverified layout (r14 verdict #6)
        if not crowded or expected is None:
            raise RuntimeError(
                "ivf_sq8_index_repair: compact sidecar is malformed "
                f"(crowded={sidecar.get('crowded')!r}, rows_crowded="
                f"{expected!r}) — cannot prove the layout-only "
                "invariant; rebuild with ivf_sq8_index_build (old "
                f"centroids preserved in {torn})"
            )
        sub = spark.read.parquet(f"{index_dir}/cells").filter(
            F.col("cluster").isin(crowded)
        )
        got = sub.count()
        if got < int(expected):
            raise RuntimeError(
                f"ivf_sq8_index_repair: compact crash LOST rows in "
                f"cells {crowded} ({got} < {expected}) — "
                "unrepairable without the corpus; rebuild with "
                "ivf_sq8_index_build"
            )
        if got > int(expected):
            # old + new file copies coexist: identical rows, so an
            # id-distinct rewrite of ONLY the affected cells is
            # lossless. Same dynamic-overwrite recipe as compact.
            id_col = cfg["id_col"]
            rows = truncate_lineage(
                sub.dropDuplicates([id_col]), checkpoint_dir,
                eager=True,
            )
            if rows.count() != int(expected):
                raise RuntimeError(
                    "ivf_sq8_index_repair: duplicate-id collapse "
                    f"does not reproduce the recorded pre-count "
                    f"{expected} — rebuild with ivf_sq8_index_build"
                )
            with _conf_override(
                spark, "spark.sql.sources.partitionOverwriteMode",
                "dynamic",
            ):
                (
                    rows.repartition("cluster")
                    .write.mode("overwrite")
                    .partitionBy("cluster")
                    .parquet(f"{index_dir}/cells")
                )
    else:
        raise RuntimeError(
            f"ivf_sq8_index_repair: torn '{op}' protocol is not "
            "repairable — a crashed (re)build may have half-overwritten "
            "the cells; rebuild with ivf_sq8_index_build (old centroids "
            f"preserved in {torn})"
        )
    _commit_manifest(fs, manifest, cfg)
    report = ivf_sq8_index_verify(spark, index_dir)
    out = {"repaired": True, "op": op, "verify": report}
    if op == "append":
        # the sidecar's touched fingerprint (recorded by
        # ivf_sq8_index_append before mutating) names the cells whose
        # bounds the crash could have moved — everything else was
        # recomputed bit-identically (deterministic per-cell min/max)
        out["touched_cells"] = sorted(
            int(c) for c in sidecar.get("touched", [])
        )
    elif op == "compact":
        out["repaired_cells"] = crowded
        out["deduplicated"] = bool(got > int(expected))
    return out


def ivf_sq8_index_compact(
    spark,
    index_dir: str,
    max_files_per_cell: int = 4,
    checkpoint_dir: str | None = None,
) -> dict:
    """Small-file compaction for a stored IVF,SQ8 index — the cost
    every append-many lifecycle accrues: each streaming epoch adds a
    file to every cell it touches, and the probe-time scan eventually
    pays per-file open/footer overhead instead of per-byte. Rewrites
    ONLY the crowded cells (file count > ``max_files_per_cell``,
    counted via the Hadoop FS listing) through Spark's dynamic
    partition overwrite — untouched cells' files are never read or
    replaced — under the crash-survivable manifest
    invalidate→rewrite→commit protocol shared with the append: a crash
    mid-compaction refuses instead of serving a half-rewritten cell,
    and :func:`ivf_sq8_index_repair` (called here automatically on
    finding a torn sidecar) restores it — the sidecar records the
    crowded cells and their exact pre-count, so repair can prove the
    layout-only invariant or losslessly collapse duplicated copies.
    Row content is unchanged (pinned by serving bit-identity); only
    the file layout moves. ``checkpoint_dir`` routes the
    read-before-overwrite pin through the reliable checkpointer
    (ADVICE r13 — survive executor loss mid-overwrite at the 100 TB
    posture). Returns ``{"compacted_cells", "files_before",
    "files_after"}``."""
    import json as _json

    from kubernetes_logs_datalake_spark.operators.lineage import (
        truncate_lineage,
    )

    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/manifest.json"
    if not fs.exists(manifest) and fs.exists(_torn(manifest)):
        ivf_sq8_index_repair(spark, index_dir)  # self-heal a torn index
    _refuse_torn(fs, manifest, "ivf_sq8_index_compact")
    cfg = _json.loads(fs.read_small(manifest))
    per_cell: dict[int, int] = {}
    for p in fs.glob(f"{index_dir}/cells/cluster=*/part-*"):
        cl = int(p.split("cluster=")[1].split("/")[0])
        per_cell[cl] = per_cell.get(cl, 0) + 1
    crowded = sorted(
        c for c, n in per_cell.items() if n > max_files_per_cell
    )
    if not crowded:
        return {"compacted_cells": 0, "files_before": sum(
            per_cell.values()
        ), "files_after": sum(per_cell.values())}
    files_before = sum(per_cell.values())
    rows = truncate_lineage(
        spark.read.parquet(f"{index_dir}/cells")
        .filter(F.col("cluster").isin(crowded)),
        checkpoint_dir, eager=True,  # read fully BEFORE overwriting
    )
    # invalidate BEFORE touching data — the sidecar carries the
    # affected cells and their pre-count so repair can verify the
    # layout-only invariant after a crash
    _invalidate_manifest(
        fs, manifest, cfg, op="compact",
        crowded=[int(c) for c in crowded], rows_crowded=rows.count(),
    )
    with _conf_override(
        spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"
    ):
        (
            rows.repartition("cluster")
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(f"{index_dir}/cells")
        )
    _commit_manifest(fs, manifest, cfg)
    after = len(fs.glob(f"{index_dir}/cells/cluster=*/part-*"))
    return {
        "compacted_cells": len(crowded),
        "files_before": files_before,
        "files_after": after,
    }


def ivf_sq8_index_drift(
    df: DataFrame,
    index_dir: str,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> dict:
    """The rebuild trigger :func:`ivf_sq8_index_append` defers to: how
    well does the FROZEN codebook still describe a new batch? Assigns
    the batch against the manifest's centers and compares its
    assignment-distance distribution to the stored corpus's own, cell
    by cell (the stored side scans ONLY the touched cells — partition
    pruning, so the monitor stays O(batch + touched cells) at lake
    scale).

    Returns ``{"n_batch", "n_touched_cells", "batch_p50", "batch_p95",
    "base_p50", "base_p95", "drift_ratio"}`` where ``drift_ratio`` =
    batch_p95 / base_p95 (≈1.0 while the batch looks like the corpus;
    grows as the distribution leaves the codebook — the deployment
    rule: the measured SCALE.md r14 calibration puts the organic
    in-distribution band at ≈1.0±0.03 and recommends investigating
    past ~1.3, where the curve has clearly exited the band). A ratio
    of ``inf`` means the batch's touched cells are DEGENERATE on the
    stored side (e.g. singleton cells whose one member is its own
    centroid — base p95 = 0): the batch landed where the corpus has
    essentially nothing, the loudest signal the monitor can emit.
    SCALE.md r14 measures both drift modes — a translated cloud
    serves fine frozen even at ratio 1.7; an emergent tight cluster
    is exact-re-rank-funnel territory rather than an automatic
    rebuild (the rebuild measurably does NOT fix its resolution
    limit).

    ``approx=False`` (default): exact ``percentile`` — the frames are
    bounded by the batch and its touched cells, but the stored side's
    exact quantile still SORTS the touched cells' distances on one
    reducer per group. ``approx=True`` switches BOTH sides to
    ``approx_percentile`` (Greenwald-Khanna, mergeable partial
    sketches — no row shuffle, the 100 TB shape for a monitor that
    runs every epoch); ``approx_accuracy`` is Spark's accuracy knob
    (error ≤ 1/accuracy of the rank). Agreement between the two modes
    is pytest-pinned; the ratio of two p95s is even less sensitive
    than the quantiles themselves."""
    import json as _json

    spark = df.sparkSession
    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/manifest.json"
    _refuse_torn(fs, manifest, "ivf_sq8_index_drift")
    cfg = _json.loads(fs.read_small(manifest))
    id_col, vec_col = cfg["id_col"], cfg["vec_col"]
    centers = cfg["centers"]
    if "rotation" in cfg:
        from kubernetes_logs_datalake_spark.operators.rotation import (
            rotate_vectors,
        )

        df = rotate_vectors(df, vec_col, cfg["rotation"])
    assigned = kmeans_assign(
        df, id_col, vec_col, centers
    ).localCheckpoint(eager=False)

    def _pct(q: float):
        if approx:
            return F.expr(
                f"approx_percentile(dist, {q}, {approx_accuracy})"
            )
        return F.expr(f"percentile(dist, {q})")

    # ONE pass over the batch: count, both percentiles AND the touched
    # cell set ride the same aggregation (r15 — the separate
    # distinct().collect() was a second full scan of the batch; at lake
    # scale the monitor's batch pass should be single)
    bq = assigned.agg(
        F.count("*").alias("n"),
        _pct(0.5).alias("p50"),
        _pct(0.95).alias("p95"),
        F.collect_set("cluster").alias("_cells"),
    ).first()
    touched = sorted(int(c) for c in (bq["_cells"] or []))
    # stored side: the cluster is KNOWN, so the distance is one O(dim)
    # fold to the OWN centroid (same formula/rounding as
    # kmeans_assign's dist) via a broadcast join on the centroid frame
    # — not the O(k·dim) full argmin the batch side needs
    cents = df.sparkSession.createDataFrame(
        [(int(j), [float(v) for v in c]) for j, c in enumerate(centers)],
        "cluster int, _c array<double>",
    )
    stored = (
        spark.read.parquet(f"{index_dir}/cells")
        .filter(F.col("cluster").isin(touched))
        .join(F.broadcast(cents), "cluster")
    )
    own_d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("_c"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    base = stored.select(float_round(F.sqrt(own_d2), 6).alias("dist"))
    bs = base.agg(
        _pct(0.5).alias("p50"),
        _pct(0.95).alias("p95"),
    ).first()
    base_p95 = float(bs["p95"] or 0.0)
    batch_p95 = float(bq["p95"] or 0.0)
    return {
        "n_batch": int(bq["n"]),
        "n_touched_cells": len(touched),
        "batch_p50": round(float(bq["p50"] or 0.0), 6),
        "batch_p95": round(batch_p95, 6),
        "base_p50": round(float(bs["p50"] or 0.0), 6),
        "base_p95": round(base_p95, 6),
        "drift_ratio": round(
            batch_p95 / base_p95, 4
        ) if base_p95 > 0 else float("inf"),
    }


#: the calibrated investigate trigger (SCALE.md r14,
#: tools/drift_calibration.py): the organic in-distribution band is
#: ≈1.0±0.03 on both the ×10 and ×20 corpora (scale-stable within
#: 1%), and ~1.3 ≈ 2σ of translation — clearly outside the band
DRIFT_INVESTIGATE_RATIO = 1.3


def index_advisor(
    df: DataFrame,
    index_dir: str,
    threshold: float = DRIFT_INVESTIGATE_RATIO,
    approx: bool = True,
    approx_accuracy: int = 10_000,
) -> dict:
    """The calibrated drift rule as CODE, not docstring (r14 verdict
    task #4): run :func:`ivf_sq8_index_drift` on a batch and map the
    ratio onto the measured two-mode analysis (SCALE.md r14,
    `tools/drift_calibration.py`):

    - ``in_band`` (ratio ≤ threshold) — the batch looks like the
      corpus (organic band ≈1.0±0.03). Frozen-codebook serving is
      fine; keep appending.
    - ``investigate`` (finite ratio > threshold) — the distribution
      has clearly left the band; the measured signature of
      TRANSLATION drift, where recall loss vs a rebuild is noise
      (±half a hit at ratio 1.70 on both organic corpora). Frozen
      serving remains sound; schedule a rebuild at convenience, not
      urgency, and keep watching the ratio's trend.
    - ``emergent`` (ratio = ∞) — the batch's touched cells are
      degenerate on the stored side: a new tight component landed
      where the corpus has essentially nothing. A rebuild measurably
      does NOT fix this mode (recall 0.175 frozen vs 0.125 rebuilt —
      resolution-limited, not cell-geometry-limited); serve these
      queries through the exact-re-rank funnel
      (:func:`sq8_cell_refine_topk`), consider raising ``n_probe``
      for the affected cells, and rebuild only once the component
      has accumulated enough mass to deserve well-populated cells.

    Defaults to the ``approx_percentile`` monitor (mergeable
    Greenwald-Khanna partials — no stored-side row sort; agrees with
    the exact monitor to 4 dp, pytest-pinned), the shape an
    every-epoch monitor needs at 100 TB. Returns the drift report
    plus ``verdict``, ``mode``, ``recommendation`` and ``threshold``.
    MUST run against the pre-append index state — after the append
    the batch's own rows sit in the touched cells and dilute (or, in
    the emergent mode, completely mask) the signal."""
    report = ivf_sq8_index_drift(
        df, index_dir, approx=approx, approx_accuracy=approx_accuracy
    )
    ratio = report["drift_ratio"]
    if ratio == float("inf"):
        verdict, mode = "emergent", "emergent-component"
        recommendation = (
            "batch landed in near-empty territory: serve its queries "
            "via the exact-re-rank funnel (sq8_cell_refine_topk), "
            "consider more probes for the touched cells; rebuild only "
            "when the new component has mass (a rebuild does not fix "
            "its resolution limit — SCALE.md r14)"
        )
    elif ratio > threshold:
        verdict, mode = "investigate", "translation"
        recommendation = (
            "distribution left the calibrated band (translation "
            "signature): frozen-codebook serving stays sound (recall "
            "gap ≈ noise at ratio 1.7), schedule a rebuild at "
            "convenience and watch the trend"
        )
    else:
        verdict, mode = "in_band", "in-distribution"
        recommendation = "frozen-codebook serving ok; keep appending"
    return {
        **report,
        "verdict": verdict,
        "mode": mode,
        "recommendation": recommendation,
        "threshold": float(threshold),
    }


def ivf_sq8_index_search(
    spark,
    index_dir: str,
    query: list[float],
    topk: int = 10,
    n_probe: int = 1,
) -> DataFrame:
    """Serve a stored IVF,SQ8 index (:func:`ivf_sq8_index_build`):
    load the manifest, pick the ``n_probe`` nearest centroids
    driver-side, and scan ONLY those cells' partitions — the probe
    filter on the partition column reaches the scan as
    ``PartitionFilters`` (plan-gated by pytest), so the other
    cells' files are never listed, opened, or decoded. Scores are
    bit-identical to :func:`ivf_sq8_topk` with the same probes (the
    shared ``_sq8_cell_score`` tail). A missing manifest (torn build)
    raises instead of serving stale cells. Manifest reads go through
    the Hadoop FS seam, so the torn-build check inspects the SAME
    filesystem the cells live on (file://, hdfs://, s3a://)."""
    import json as _json

    fs = _index_fs(spark, index_dir)
    manifest = f"{index_dir}/manifest.json"
    _refuse_torn(fs, manifest, "ivf_sq8_index_search")
    cfg = _json.loads(fs.read_small(manifest))
    dim = int(cfg["dim"])
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != index dim {dim}")
    if "rotation" in cfg:
        # the index was built in rotated space (OPQ pre-transform):
        # rotate the query into it — one dim×dim matvec, driver-side;
        # orthonormality keeps every reported score identical to the
        # raw-space dot product
        R = cfg["rotation"]
        query = [
            sum(R[i][j] * float(query[j]) for j in range(dim))
            for i in range(dim)
        ]
    centers = cfg["centers"]
    probe = _pick_probes(query, centers, n_probe)
    cellsdf = spark.read.parquet(f"{index_dir}/cells")
    bounds = spark.read.parquet(f"{index_dir}/bounds")
    probed = cellsdf.filter(
        F.col("cluster").isin([int(p) for p in probe])
    )
    return _sq8_cell_score(
        probed, cfg["id_col"], cfg["vec_col"], query, dim, topk,
        int(cfg["scale"]), bounds,
    )
