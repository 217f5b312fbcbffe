"""As-of join — a custom operator Spark lacks natively (SURVEY §7.4
extension; the reference has no joins beyond a dead null-safe equi-join,
SURVEY §2.3).

``asof_join(left, right, ...)`` attaches, to every left row, the most
recent right row per key whose timestamp is ≤ (or <, ``strict=True``) the
left row's timestamp.

Implementation is the union-merge pattern, the scale-correct formulation:
tag both sides, union, sort within each key by (time, side-rank), and
carry right-side values forward with ``last(..., ignorenulls=True)`` over
a running window. One shuffle on the key, no time-range cross product —
at 100 TB this is a single sort-based window over the combined stream,
versus the O(|L|·|R|) blowup of a theta-join ``l.t >= r.t`` formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_time: str, right_time: str,
              value_cols: dict[str, str], strict: bool = False) -> DataFrame:
    """Returns ``left`` plus, for each entry of ``value_cols``
    ({right_col: output_name}), the value from the latest right row at or
    before (``strict``: strictly before) the left row's time, per ``on``
    key. Ties inside the right side resolve to the row sorting last by
    ``right_time`` then the value columns (deterministic)."""
    l_tag = 1
    r_tag = 2 if strict else 0   # strict: right rows at equal t sort AFTER
    lhs = left.withColumn("_t", F.col(left_time)) \
              .withColumn("_side", F.lit(l_tag))
    rhs = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(r_tag).alias("_side"),
        *[F.col(src).alias(f"_v_{src}") for src in value_cols],
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (Window.partitionBy(*on)
         .orderBy("_t", "_side", *[f"_v_{src}" for src in value_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for src, out_name in value_cols.items():
        u = u.withColumn(out_name,
                         F.last(f"_v_{src}", ignorenulls=True).over(w))
    return (u.where(F.col("_side") == l_tag)
            .drop("_t", "_side", *[f"_v_{src}" for src in value_cols]))
