"""OPQ-style subspace decorrelation: a learned orthonormal rotation
applied to an embedding column before subspace quantization.

Why this module exists (SCALE.md round 12, both measured): two shipped
operators have favorable regimes gated on the SAME geometric
precondition —

- the IMI product-cell join (``similarity.imi_knn_join``) wins 2.2×
  when the two vector halves assign near-independently, but on the
  organic clustered corpus component identity correlates the halves and
  the product collapses to 81/729 occupied cells;
- per-cell SQ8 (``vectors.sq8_cell_topk``) buys
  ``log2(global range / cell range)`` effective bits per dim, only
  1.76 bits on the same corpus because the mixture components span the
  global range along the same raw axes they cluster on.

A single fit-once orthonormal rotation R (the OPQ idea — Ge et al.
2013, "Optimized Product Quantization"; the non-parametric init is
PCA + eigenvalue-balanced bucket allocation) is the standard unlock:
``v' = R·v`` preserves dot products, L2 distances and cosines exactly
(in exact arithmetic — orthonormality), so the ANN metric and its
ground truth are unchanged, while the coordinate system the subspace
splitter / per-dim quantizer sees is decorrelated.

Spark-first posture: the FIT is a bounded driver-side numpy
eigendecomposition over a sampled covariance (dim×dim — 64×64 here —
the same "k·dim doubles cross the driver, never the data" contract as
``kmeans_fit``); the APPLY is one Arrow-batched ``mapInPandas`` matmul
(a build-time transform in the index lifecycle — the same confinement
policy as the media-decode and model-inference islands: it never runs
inside a registered query plan), or an expression form for small dims.

Reference scope note: the reference engine (Yolean/kubernetes-logs-
datalake) has no vector ops at all — this module extends the engine
for the LLM-data-pipeline surface the build brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sample_matrix(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    sample_mod: int | None,
    max_rows: int,
):
    """Bounded driver-side sample of the vector column as a numpy
    matrix: deterministic ``pmod(xxhash64(id), mod) == 0`` thinning
    (the ``fit_sample_mod`` idiom), then a hard LIMIT as the safety
    net. At 100 TB the caller sizes ``sample_mod`` so the sample is
    O(100k) rows — a dim×dim covariance needs far less."""
    import numpy as np

    sampled = df.select(F.col(id_col), F.col(vec_col))
    if sample_mod and sample_mod > 1:
        sampled = sampled.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
        )
    rows = (
        sampled.orderBy(id_col)  # deterministic under the LIMIT
        .limit(max_rows)
        .collect()
    )
    return np.asarray([r[1] for r in rows], dtype=np.float64)


def _sign_normalize(R):
    """Fix each row's sign so the largest-|component| entry is
    positive — eigenvectors are sign-ambiguous; this makes the fit
    bit-reproducible across BLAS builds that flip signs."""
    import numpy as np

    idx = np.argmax(np.abs(R), axis=1)
    signs = np.sign(R[np.arange(R.shape[0]), idx])
    signs[signs == 0] = 1.0
    return R * signs[:, None]


def _balance_buckets(eigvals, m: int) -> list[int]:
    """Greedy eigenvalue-balanced allocation (the OPQ non-parametric
    init): assign components in descending-eigenvalue order, each to
    the bucket with the smallest current log-variance product, so every
    subspace ends with a comparable variance budget. Returns, per
    bucket, the component indices it owns (each bucket gets exactly
    dim/m components)."""
    import math

    dim = len(eigvals)
    per = dim // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    loads = [0.0] * m
    order = sorted(range(dim), key=lambda i: (-eigvals[i], i))
    for comp in order:
        # smallest load among buckets with room; ties by index
        cands = [b for b in range(m) if len(buckets[b]) < per]
        b = min(cands, key=lambda x: (loads[x], x))
        buckets[b].append(comp)
        loads[b] += math.log(max(float(eigvals[comp]), 1e-12))
    return [i for bucket in buckets for i in sorted(bucket)]


def fit_pca_rotation(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    subspaces: int = 2,
    sample_mod: int | None = None,
    max_rows: int = 100_000,
) -> list[list[float]]:
    """Fit a deterministic orthonormal rotation: PCA over a bounded
    sample, then the eigenvectors PERMUTED by the eigenvalue-balanced
    bucket allocation so each of the ``subspaces`` contiguous slices
    of the output carries a comparable share of the variance (raw PCA
    order would do the opposite — concentrate all variance in the
    first slice and make half-correlation WORSE). Returns R as a
    dim×dim row-major list; apply with :func:`rotate_vectors`
    (``v' = R·v``).

    Determinism: the sample is hash-thinned + id-ordered, covariance
    and ``eigh`` are numpy (deterministic for a given input), rows are
    sign-normalized. The rotation is a build-once artifact — persist
    it next to the codebooks it decorrelates (both index manifests are
    JSON of small float matrices).
    """
    import numpy as np

    if dim % subspaces:
        # _balance_buckets allocates exactly dim // subspaces components
        # per bucket; a non-dividing count would strand the remainder
        # components with no bucket and surface as an opaque
        # "min() arg is an empty sequence" (ADVICE r13) — name both
        # values instead
        raise ValueError(
            f"fit_pca_rotation: dim={dim} is not divisible by "
            f"subspaces={subspaces} — the balanced allocation needs "
            "equal-width subspaces (pad the vectors or change the "
            "subspace count)"
        )
    X = _sample_matrix(df, id_col, vec_col, sample_mod, max_rows)
    return fit_rotation_from_matrix(X, dim, subspaces)


def fit_rotation_from_matrix(X, dim: int, subspaces: int = 2):
    """The engine-neutral numpy core of :func:`fit_pca_rotation`:
    covariance → ``eigh`` → eigenvalue-balanced permutation → sign
    normalization, over an already-materialized float64 sample matrix.
    Factored out (r13 verdict task #4) so an ORACLE can replay the
    exact fit without a SparkSession — load the same rows (id-ordered,
    limit-capped, float64) from parquet via pyarrow and both paths
    produce a bit-identical R (same numpy build, deterministic
    ``eigh``), which is what makes a corpus-dependent rotated query
    hash-checkable against a literal-R SQL oracle."""
    import numpy as np

    if dim % subspaces:
        raise ValueError(
            f"fit_rotation_from_matrix: dim={dim} is not divisible by "
            f"subspaces={subspaces} — the balanced allocation needs "
            "equal-width subspaces"
        )
    X = np.asarray(X, dtype=np.float64)
    if X.shape[0] < dim:
        raise ValueError(
            f"rotation fit needs >= dim={dim} sample rows, got {X.shape[0]}"
        )
    if X.shape[1] != dim:
        raise ValueError(f"vector width {X.shape[1]} != dim {dim}")
    C = np.cov(X, rowvar=False, bias=True)
    eigvals, eigvecs = np.linalg.eigh(C)  # ascending
    eigvals, eigvecs = eigvals[::-1], eigvecs[:, ::-1]  # descending
    order = _balance_buckets([float(v) for v in eigvals], subspaces)
    R = _sign_normalize(eigvecs[:, order].T)  # rows = output dims
    return [[float(v) for v in row] for row in R]


def random_rotation(dim: int, seed: int = 0) -> list[list[float]]:
    """Seeded random orthonormal rotation (QR of a deterministic
    Gaussian matrix, sign-fixed so R is unique): the data-independent
    baseline — spreads variance approximately evenly across all
    output dims, which is often enough to decorrelate subspace
    assignments (the cheap alternative OPQ papers benchmark
    against)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    A = rng.normal(0.0, 1.0, (dim, dim))
    Q, Rr = np.linalg.qr(A)
    # make the decomposition unique: positive diagonal of Rr
    Q = Q * np.sign(np.diag(Rr))[None, :]
    return [[float(v) for v in row] for row in Q.T]


def rotate_vector_expr(vec_col, rotation: list[list[float]]):
    """EXPRESSION form of ``v' = R·v`` — one packed matrix literal
    (``literal_matrix``: a flat packed literal + foldable slices, no
    per-element py4j round-trips) and two nested higher-order
    functions: ``transform(R, row -> aggregate(zip_with(
    row, v, *), 0.0, +))``. The accumulation per output dim is the
    sequential left-to-right fold, IEEE-identical to DuckDB's
    ``list_sum(list_transform(...))`` — which is what makes a rotated
    query ORACLE-CHECKABLE (the SQL replays the same literal R in the
    same order).

    When to use which: this form keeps the plan Python-free (the
    PLAN_AUDIT invariant for registered queries) and costs O(dim²)
    interpreted HOF steps per row — right for serving plans over
    oracle-scale corpora and modest dims. :func:`rotate_vectors` (the
    Arrow GEMM) is the build-time/bulk path: ~C-speed, but a
    ``mapInPandas`` island."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.functions.vectors import (
        literal_matrix,
    )

    v = F.col(vec_col) if not isinstance(vec_col, Column) else vec_col
    return F.transform(
        literal_matrix(rotation),
        lambda row: F.aggregate(
            F.zip_with(row, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def rotate_vectors(
    df: DataFrame,
    vec_col: str,
    rotation: list[list[float]],
    batch_size: int | None = None,
) -> DataFrame:
    """Apply ``v' = R·v`` to an ``array<double>`` column, preserving
    every other column. Arrow-batched ``mapInPandas`` numpy matmul —
    one (batch × dim) @ (dim × dim) GEMM per Arrow batch, C speed; an
    expression-tree form would be a dim² term explosion (4096 terms at
    dim 64) in plan-build and codegen for arithmetic that has no
    pushdown or codegen-fusion value. This is a BUILD-TIME transform
    (index lifecycle), deliberately outside registered query plans —
    the PLAN_AUDIT 0-python_eval invariant applies to serving plans,
    not to fit/build islands."""
    import numpy as np

    R = np.asarray(rotation, dtype=np.float64)
    dim = R.shape[0]
    if R.shape != (dim, dim):
        raise ValueError(f"rotation must be square, got {R.shape}")
    schema = df.schema
    names = df.columns
    vec_idx = names.index(vec_col)

    def _rotate(batches):
        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf.iloc[:, vec_idx]]
            )
            if mat.size:
                if mat.shape[1] != dim:
                    raise ValueError(
                        f"vector width {mat.shape[1]} != rotation dim {dim}"
                    )
                out = mat @ R.T
                pdf.isetitem(vec_idx, [list(map(float, row)) for row in out])
            yield pdf

    return df.mapInPandas(_rotate, schema)
