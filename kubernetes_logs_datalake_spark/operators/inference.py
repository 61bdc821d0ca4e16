"""Batch model-inference plumbing: score every row of a corpus with a
Python model through Arrow-batched ``mapInPandas`` — the shape for
"run the classifier/embedder/reranker over 100 TB".

What is real here (and tested): the Spark-side architecture — schema,
Arrow batch streaming, model loaded ONCE per Python worker (not per
row, not per batch), bounded ``batch_rows`` re-chunking so a model's
memory ceiling is independent of ``spark.sql.execution.arrow
.maxRecordsPerBatch``, deterministic outputs. What is stubbed: the
model itself — this container has no torch/onnx, so the default model
factory is a deterministic hashed-feature linear scorer (the
``classify.py`` math in numpy form). Swapping in a real model is the
factory closure; nothing else changes.

At 100 TB this is the only viable shape: the corpus streams through
Arrow into long-lived Python workers, GPU/accelerator affinity comes
from executor placement, and the per-worker model load amortizes over
the whole input split. Row-at-a-time Python UDFs are banned here by
the plan gates; this module is the sanctioned Python island.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SCORES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("model_version", T.StringType()),
    ]
)


def stub_model_factory(dim: int = 64, seed: int = 7):
    """Deterministic stand-in for a real model load: a hashed
    bag-of-words linear scorer (numpy). Returns ``(predict, version)``
    where ``predict(texts: list[str]) -> list[float]``. A real
    deployment replaces this factory with e.g. a torch/onnx session
    load — the expensive call this plumbing guarantees happens once
    per worker, not once per batch."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(seed)
    weights = rng.standard_normal(dim)

    def predict(texts) -> list[float]:
        out = []
        for t in texts:
            vec = np.zeros(dim)
            for w in str(t or "").lower().split():
                h = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[:4], "big"
                )
                vec[h % dim] += 1.0
            n = np.linalg.norm(vec)
            out.append(float(weights @ (vec / n)) if n > 0 else 0.0)
        return out

    return predict, f"stub-linear-{dim}-{seed}"


def batch_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model_factory: Callable = stub_model_factory,
    batch_rows: int = 256,
    scale: int = 6,
) -> DataFrame:
    """Score every row with the factory's model: (doc_id, score,
    model_version), rounded to ``scale``.

    Contract (asserted by tests):

    - the factory runs ONCE per ``mapInPandas`` task, however many
      Arrow batches stream through it;
    - every model call sees at most ``batch_rows`` rows, whatever
      Arrow's own batch size is — the knob that caps a real model's
      activation memory;
    - output is row-aligned with the input ids and deterministic.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        predict, version = model_factory()  # once per task
        for pdf in batches:
            for off in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[off : off + batch_rows]
                scores = predict(list(chunk[text_col]))
                yield pd.DataFrame(
                    {
                        "doc_id": chunk[id_col].astype("int64").values,
                        "score": [round(s, scale) for s in scores],
                        "model_version": version,
                    }
                )

    return df.select(id_col, text_col).mapInPandas(run, SCORES_SCHEMA)
