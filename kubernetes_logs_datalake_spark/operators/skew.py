"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. ``salted_join`` is
the explicit fallback for pathological producer skew — the classic
log-analytics case: one namespace/pod emits 100x the traffic, so a
plain equi-join on that key funnels a whole day of one pod through a
single reducer.

Mechanics: replicate the small side ``salt`` times (salt ∈ [0, n)),
scatter the big side uniformly with a deterministic ``pmod(xxhash64,
n)``, and join on (key, salt). The big side never replicates; the small
side grows n-fold (fine — it is small); the hot key now spreads over n
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-spread of
    hot keys. Output columns = big's columns + small's non-key columns
    (like a plain ``join(on=...)``).

    Only ``inner`` and ``left`` (big-side-preserving) joins are sound:
    the small side is replicated per salt, so right/full-outer would
    emit each unmatched small row once per replica."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the salt-replicated small side multiplies unmatched rows "
            "under right/full-outer semantics"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    explode_salt = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    salted_small = small.select("*", explode_salt)
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")
