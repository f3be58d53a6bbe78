"""Blocked record linkage: candidate generation by blocking key, then
edit-distance verification.

The all-pairs comparison behind entity resolution is quadratic; the
standard fix (Fellegi-Sunter style pipelines, Dedupe, Splink) is
*blocking*: hash both sides to a coarse key, compare only within blocks.
That maps exactly onto a Spark equi-join on the block key — candidate
pairs never materialize outside their block, and the verify predicate
(Levenshtein, exact integer DP in every engine) runs inside the join.

Scale (100 TB): cost is sum over blocks of |L_b| x |R_b|, not |L| x |R|.
The block key is the shuffle partitioner; a skewed block is the same
hazard as a skewed join key (mitigate upstream with `operators/skew.py`
salting or a finer key). Levenshtein cost is O(len^2) per pair — cap
text length upstream for hot paths (`dedup.prefix_levenshtein` pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_link(
    left: DataFrame,
    right: DataFrame,
    left_block: Column,
    right_block: Column,
    left_text: str,
    right_text: str,
    max_distance: int = 5,
) -> DataFrame:
    """Candidate pairs sharing a block key whose texts are within
    ``max_distance`` edits. All of ``left``'s and ``right``'s columns are
    carried through, plus ``block`` and ``distance``."""
    lb = left.withColumn("__lb", left_block)
    rb = right.withColumn("__rb", right_block)
    return (
        lb.join(rb, lb["__lb"] == rb["__rb"])
        .withColumn(
            "distance",
            F.levenshtein(F.col(left_text), F.col(right_text)).cast("long"),
        )
        .where(F.col("distance") <= max_distance)
        .withColumn("block", F.col("__lb"))
        .drop("__lb", "__rb")
    )
