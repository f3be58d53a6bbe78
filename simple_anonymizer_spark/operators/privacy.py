"""Privacy-risk audits: k-anonymity and l-diversity over quasi-identifiers.

The engine's anonymizers (``functions/anonymizers.py``) transform values;
these operators MEASURE what a release actually guarantees, using the
standard re-identification metrics from the public literature:

* **k-anonymity** (Sweeney 2002): every quasi-identifier combination is
  shared by at least k rows. The audit reports the achieved k (the
  smallest group), plus how many rows sit in groups under a risk
  threshold — the rows a linkage attack singles out.
* **l-diversity** (Machanavajjhala et al. 2007): within each
  quasi-identifier group, the sensitive attribute takes at least l
  distinct values — k-anonymity alone fails when a group is homogeneous
  in the secret.

Scale (100 TB): both are one map-side-combinable aggregation keyed by
the quasi-identifier tuple followed by a scalar summary — the same cost
as a count-distinct report. Skewed QI combinations (huge groups) are
harmless: they are the SAFE ones; risk concentrates in the tiny groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k_threshold: int = 5
) -> DataFrame:
    """One-row k-anonymity report.

    Output: ``k_anonymity`` (size of the smallest QI group — the k the
    release actually achieves), ``n_groups``, ``n_rows``,
    ``rows_at_risk`` (rows in groups smaller than ``k_threshold``),
    ``pct_at_risk`` (one double division)."""
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return groups.agg(
        F.min("__n").alias("k_anonymity"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__n") < k_threshold, F.col("__n"))
              .otherwise(F.lit(0))).cast("long").alias("rows_at_risk"),
    ).select(
        "k_anonymity", "n_groups", "n_rows", "rows_at_risk",
        (F.lit(100.0) * F.col("rows_at_risk").cast("double")
         / F.col("n_rows").cast("double")).alias("pct_at_risk"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """One-row l-diversity report for ``sensitive_col``.

    Output: ``l_diversity`` (min distinct sensitive values over QI
    groups), ``n_groups``, ``homogeneous_groups`` (exactly one sensitive
    value — fully disclosed), ``groups_below_l``."""
    groups = df.groupBy(*quasi_cols).agg(
        F.countDistinct(F.col(sensitive_col)).cast("long").alias("__l")
    )
    return groups.agg(
        F.min("__l").alias("l_diversity"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("__l") == 1, 1).otherwise(0)).cast("long")
        .alias("homogeneous_groups"),
        F.sum(F.when(F.col("__l") < l_threshold, 1).otherwise(0)).cast("long")
        .alias("groups_below_l"),
    )
