"""Top-N truncation per origin (reference R13, ``DataStore.scala:16-24``).

Engine default = sane kNN semantics: keep the N NEAREST neighbors,
deterministic tiebreak on neighbor id, ties at equal distance all kept up
to N. Applied BEFORE result assembly so the collect_list shuffle is bounded
(reference truncates after materializing the full candidate list).

``parity_topn=True`` reproduces the reference's two (untested) quirks:
its SortedSet fold evicts the MINIMUM when full — keeping the N FARTHEST
within radius — and dedups equal distances (``Ordering.by(euclideanDistance)``
collapses ties; we keep the min-id representative deterministically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_origin(
    pairs: DataFrame,
    n,
    origin_id: str = "origin_id",
    neighbor_id: str = "neighbor_id",
    distance: str = "distance_km",
    parity_topn: bool = False,
) -> DataFrame:
    """``n`` may be an int (uniform cap) or a column name / Column carrying
    the per-ORIGIN-row cap — the reference's per-inquiry ``maxResults``
    (``DataStore.scala:29-41``, R4/R13 full generality). The plan is the
    same single window either way; a per-row cap just makes the rank
    comparison a column-column one.

    NULL semantics with a per-row cap: ``rank <= NULL`` is never true, so
    an origin whose cap column is NULL keeps ZERO rows — silently, by SQL
    comparison semantics (consistent with the per-row join's NULL-radius
    behavior; see radius_join_pairs_per_row). Coalesce the cap upstream
    (``F.coalesce(cap, F.lit(default))``) if NULL should mean "uncapped"
    or a default."""
    cap = F.col(n) if isinstance(n, str) else (
        n if isinstance(n, Column) else F.lit(int(n))
    )
    if parity_topn:
        # dedup equal distances (min neighbor id representative), then keep
        # the n FARTHEST — reference SortedSet fold semantics
        dedup_w = Window.partitionBy(origin_id, distance).orderBy(neighbor_id)
        deduped = (
            pairs.withColumn("_dd", F.row_number().over(dedup_w))
            .where(F.col("_dd") == 1)
            .drop("_dd")
        )
        w = Window.partitionBy(origin_id).orderBy(
            F.col(distance).desc(), F.col(neighbor_id)
        )
        ranked = deduped.withColumn("_rn", F.row_number().over(w))
    else:
        w = Window.partitionBy(origin_id).orderBy(
            F.col(distance).asc(), F.col(neighbor_id)
        )
        ranked = pairs.withColumn("_rn", F.row_number().over(w))
    return ranked.where(F.col("_rn") <= cap).drop("_rn")
