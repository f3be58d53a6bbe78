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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import _raw_hash


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


HASH_BITS = 31  # resolution of the stable-hash uniform (functions/hashing.py)


def dlap_thresholds(eps: float, bits: int = HASH_BITS) -> list[int]:
    """Cumulative thresholds of the discrete Laplace (two-sided
    geometric) distribution with parameter ``alpha = exp(-eps)``, scaled
    to the ``[0, 2^bits)`` hash-uniform grid.

    ``P(noise = k) = (1-alpha)/(1+alpha) * alpha^|k|`` is the canonical
    eps-DP mechanism for integer counts of sensitivity 1 (Ghosh,
    Roughgarden & Sundararajan 2009). The returned list holds
    ``floor(CDF(k) * 2^bits)`` for ``k = -K .. K-1`` with K sized so the
    truncated tail mass is below the grid resolution; the inverse-CDF
    lookup is then ``noise(u) = #{t : t <= u} - K`` — pure integer
    comparisons, so Spark and DuckDB embed the SAME literal table and
    agree bit-for-bit.
    """
    alpha = math.exp(-eps)
    max_k = int(math.ceil((bits + 2) * math.log(2) / eps)) + 1
    out = []
    for k in range(-max_k, max_k):
        if k < 0:
            c = alpha ** (-k) / (1 + alpha)
        else:
            c = 1 - alpha ** (k + 1) / (1 + alpha)
        out.append(min(2**bits, int(math.floor(c * 2**bits))))
    return out


def dlap_noise_expr(u: Column, eps: float) -> Column:
    """Deterministic discrete-Laplace noise from a hash uniform ``u``
    (int64 in ``[0, 2^31)``) — the count of CDF thresholds at or below
    ``u``, recentered."""
    thresholds = dlap_thresholds(eps)
    arr = F.array(*[F.lit(t).cast("long") for t in thresholds])

    def _le(t: Column) -> Column:
        return t <= u

    return (F.size(F.filter(arr, _le)).cast("long")
            - F.lit(len(thresholds) // 2).cast("long"))


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    eps: float = 0.5,
    seed: str = "dp",
) -> DataFrame:
    """eps-differentially-private group counts (release form).

    Each group's true count gets discrete-Laplace noise derived from the
    stable hash of ``seed | group key`` — deterministic under a fixed
    seed (reproducible releases, exact oracle parity), fresh noise under
    a new seed. Counts clamp at 0. Scope: counting queries where one
    input row contributes to exactly one group (sensitivity 1); callers
    must pre-bound per-entity contributions if entities repeat.

    SECURITY CONTRACT — the seed must be (a) secret from release
    consumers (a known seed lets an adversary subtract the noise
    exactly) and (b) unique per release: publishing two releases of
    CHANGING data under the same seed gives identical per-group noise,
    so differencing the releases reveals exact true-count deltas and
    silently voids the eps-DP guarantee. Fold a release identifier into
    ``seed`` (e.g. ``f"{secret}|{release_id}"``) and account epsilon
    across releases by composition (k releases under eps each consume
    k*eps of budget).

    Scale (100 TB): one map-side-combinable count aggregation; the noise
    expression runs per GROUP (not per row) over a constant-folded
    threshold array, so the release costs the same as the plain count.

    Output: ``*group_cols, noisy_count (int64)``.
    """
    grp = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    key = F.concat_ws(
        "|",
        F.lit(seed),
        *[F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
          for c in group_cols],
    )
    noise = dlap_noise_expr(_raw_hash(key), eps)
    return grp.select(
        *group_cols,
        F.greatest(F.lit(0).cast("long"), F.col("__n") + noise)
        .alias("noisy_count"),
    )


# Example ladder for the customer QI release (shared by the Spark query
# and the DuckDB oracle — expression syntax valid in BOTH engines: STRING
# is DuckDB's VARCHAR alias, floor-before-BIGINT-cast avoids the
# truncate-vs-round cast divergence).
CUSTOMER_QI_LADDER: dict[str, list[str]] = {
    "c_mktsegment": ["c_mktsegment", "'*'"],
    "c_nationkey": ["CAST(c_nationkey AS STRING)", "'*'"],
    "c_acctbal": [
        "CAST(CAST(floor(c_acctbal / 100) * 100 AS BIGINT) AS STRING)",
        "CAST(CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS STRING)",
        "'*'",
    ],
}


def generalize_to_k(
    df: DataFrame,
    id_col: str,
    ladder: dict[str, list[str]],
    k: int,
) -> DataFrame:
    """Samarati-style minimal uniform generalization: coarsen the
    quasi-identifier columns up their generalization ladders until the
    release is k-anonymous, using the LOWEST level that suffices.

    ``ladder`` maps each QI column to SQL expression strings (most
    specific first, each producing a string; shorter ladders repeat
    their last rung). Level ``l`` applies rung ``min(l, len-1)`` of
    every ladder; the chosen level is the smallest whose minimum group
    size reaches ``k``, falling back to the deepest level (typically
    full suppression ``'*'``) when none does.

    Output: ``<id_col>``, one generalized string column per QI (same
    name), and ``gen_level (int64)``.

    Scale (100 TB): one map-side-combinable aggregation per candidate
    level (ladders are 2-4 rungs, so a handful of scans — or one, if
    the caller pre-projects all rungs and uses grouping sets), then a
    single-row broadcast of the chosen level into a pure projection.
    Everything is exact string/integer algebra — level choice is
    bit-reproducible, which is what makes the release auditable.
    """
    cols = list(ladder)
    n_levels = max(len(v) for v in ladder.values())

    def rung(col: str, level: int) -> F.Column:
        exprs = ladder[col]
        return F.expr(exprs[min(level, len(exprs) - 1)])

    per_level = [
        df.groupBy(*[rung(c, lv).alias(f"__g{i}")
                     for i, c in enumerate(cols)])
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.min("__n").cast("long").alias("__min_size"))
        .select(F.lit(lv).cast("long").alias("__level"), "__min_size")
        for lv in range(n_levels)
    ]
    levels_df = per_level[0]
    for p in per_level[1:]:
        levels_df = levels_df.unionAll(p)
    chosen = levels_df.agg(
        F.coalesce(
            F.min(F.when(F.col("__min_size") >= k, F.col("__level"))),
            F.lit(n_levels - 1).cast("long"),
        ).alias("__chosen")
    )

    def pick(col: str) -> F.Column:
        out = rung(col, n_levels - 1)
        for lv in range(n_levels - 2, -1, -1):
            out = F.when(F.col("__chosen") == lv, rung(col, lv)).otherwise(out)
        return out.alias(col)

    return (
        df.crossJoin(F.broadcast(chosen))
        .select(
            F.col(id_col),
            *[pick(c) for c in cols],
            F.col("__chosen").alias("gen_level"),
        )
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


# ---------------------------------------------------------------------------
# Memorization canaries (Carlini et al. 2019, "The Secret Sharer",
# arXiv:1802.08232): plant deterministic unique sequences in a corpus,
# then audit that a pipeline stage preserved (or removed) every one.
# ---------------------------------------------------------------------------

CANARY_SALT = "__canary|"
_CANARY_RE = "CANARY([0-9a-f]{16})"


def _canary_secret(id_col: str, salt: str):
    """16-hex-char per-document secret — the md5 kernel keyed on the doc
    id, distinct from the selection hash (different suffix)."""
    return F.lower(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(salt), F.lit("secret"))),
            1, 16,
        )
    )


def inject_canaries(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_mod: int = 16,
    salt: str = CANARY_SALT,
) -> DataFrame:
    """Append a unique ``CANARY<secret>`` marker to every document whose
    salted id-hash lands on ``% rate_mod == 0`` — a deterministic 1-in-
    rate_mod planting, reproducible at any scale without a side table
    (the expected set derives from the same expressions). Map-only."""
    from ..functions.textops import salted_hash

    sel = (
        salted_hash(F.col(id_col).cast("string"), salt) % rate_mod == 0
    )
    return df.withColumn(
        text_col,
        F.when(
            sel,
            F.concat(F.col(text_col), F.lit(" CANARY"),
                     _canary_secret(id_col, salt)),
        ).otherwise(F.col(text_col)),
    )


def expected_canaries(
    df: DataFrame,
    id_col: str = "doc_id",
    rate_mod: int = 16,
    salt: str = CANARY_SALT,
) -> DataFrame:
    """The planted set ``<id_col>, secret`` — recomputed from the same
    hash expressions, never stored."""
    from ..functions.textops import salted_hash

    return df.where(
        salted_hash(F.col(id_col).cast("string"), salt) % rate_mod == 0
    ).select(F.col(id_col), _canary_secret(id_col, salt).alias("secret"))


def detect_canaries(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Extract surviving canary secrets: ``<id_col>, secret`` for every
    document whose text still carries the marker (RE2-safe pattern, no
    backslashes). Map-only scan."""
    secret = F.regexp_extract(F.col(text_col), _CANARY_RE, 1)
    return (
        df.select(F.col(id_col), secret.alias("secret"))
        .where(F.col("secret") != "")
    )


def canary_report(found: DataFrame, expected: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """One-row audit: ``n_expected, n_found, n_missing, n_spurious`` from
    a full outer join on ``(id, secret)`` — missing canaries mean the
    audited stage DROPPED planted content; spurious ones mean it
    fabricated or duplicated it. Both sides are 1/rate_mod of the corpus;
    the join is delta-sized."""
    f = found.select(F.col(id_col).alias("__id"),
                     F.col("secret").alias("__fs")).withColumn("__f", F.lit(1))
    e = expected.select(F.col(id_col).alias("__id"),
                        F.col("secret").alias("__fs")).withColumn("__e", F.lit(1))
    j = f.join(e, ["__id", "__fs"], "full_outer")
    return j.agg(
        F.coalesce(F.sum("__e"), F.lit(0)).cast("long").alias("n_expected"),
        F.coalesce(F.sum("__f"), F.lit(0)).cast("long").alias("n_found"),
        F.coalesce(F.sum(F.when(F.col("__f").isNull(), 1)), F.lit(0))
        .cast("long").alias("n_missing"),
        F.coalesce(F.sum(F.when(F.col("__e").isNull(), 1)), F.lit(0))
        .cast("long").alias("n_spurious"),
    )


# ---------------------------------------------------------------------------
# Mondrian multidimensional k-anonymity (LeFevre et al. 2006) — the
# standard partition-based algorithm next to the Samarati uniform ladder
# above: recursive median cuts on the widest quasi-identifier range,
# each cut allowed only when both halves keep >= k records.
# ---------------------------------------------------------------------------


def mondrian_anonymize(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 10,
    max_depth: int = 4,
    id_col: str = "id",
) -> DataFrame:
    """Mondrian k-anonymization over INTEGER quasi-identifiers (convert
    currency to exact cents upstream — the engine's integer-cents rule).

    Each level splits every current partition at the median of its
    widest-range QI (strict median-element cut: value at row
    ``(n + 1) div 2`` under the deterministic ``(value, id)`` order),
    skipping partitions where no dimension can be cut without dropping a
    side below ``k``. Dimension choice is ``allowable first, widest
    integer range, lowest dimension index`` — every decision derives
    deterministically from the data, so the whole recursion (driver-side
    here) is mirrored level-for-level in the DuckDB oracle.

    Output: one row per input record — ``<id_col>``, then per QI
    ``<qi>_lo / <qi>_hi`` (the record's equivalence-class bounds — the
    generalized release), and ``class_size long``. Every class has
    ``class_size >= k`` whenever the input itself has >= k rows.

    Scale (100 TB): the corpus never collects — each level is two
    aggregation passes (order statistics via one ``(partition, dim)``
    window, then side counts) plus a driver collect bounded by
    ``n_dims * 2^level`` rows; the relabeling is a literal CASE chain
    (model-sized state, the k-means/BPE pattern). Window partitions are
    equivalence classes, which median cuts keep balanced — no skewed
    reducer.
    """
    if k < 1 or max_depth < 0 or not qi_cols:
        raise ValueError("need k >= 1, max_depth >= 0, and QI columns")
    from pyspark.sql import Window

    work = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c).cast("long").alias(f"__q{d}")
          for d, c in enumerate(qi_cols)],
    ).withColumn("__label", F.lit(0).cast("long"))

    n_dims = len(qi_cols)
    for _level in range(max_depth):
        # Long format: one row per (record, dim).
        unpiv = work.select(
            "__id", "__label",
            F.explode(
                F.array(*[
                    F.struct(F.lit(d).alias("dim"),
                             F.col(f"__q{d}").alias("val"))
                    for d in range(n_dims)
                ])
            ).alias("__dv"),
        ).select("__id", "__label", F.col("__dv.dim").alias("__dim"),
                 F.col("__dv.val").alias("__val"))
        w = Window.partitionBy("__label", "__dim").orderBy("__val", "__id")
        ranked = unpiv.select(
            "__label", "__dim", "__val",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(
                Window.partitionBy("__label", "__dim")
            ).alias("__n"),
            F.min("__val").over(
                Window.partitionBy("__label", "__dim")
            ).alias("__lo"),
            F.max("__val").over(
                Window.partitionBy("__label", "__dim")
            ).alias("__hi"),
        )
        meds = ranked.where(F.col("__rn") == F.expr("(__n + 1) div 2"))
        med_stats = meds.select(
            "__label", "__dim", F.col("__val").alias("__med"),
            "__n", "__lo", "__hi",
        )
        side = (
            unpiv.join(
                med_stats.select("__label", "__dim", "__med"),
                ["__label", "__dim"],
            )
            .groupBy("__label", "__dim")
            .agg(F.sum((F.col("__val") <= F.col("__med")).cast("long"))
                 .cast("long").alias("__cle"))
        )
        info = {
            (r["__label"], r["__dim"]): r
            for r in med_stats.join(side, ["__label", "__dim"]).collect()
        }
        # Driver decision per partition: allowable, widest range, lowest
        # dim index.
        labels = sorted({lab for lab, _ in info})
        cuts = {}
        for lab in labels:
            best = None
            for d in range(n_dims):
                r = info[(lab, d)]
                lo_n, hi_n = r["__cle"], r["__n"] - r["__cle"]
                if min(lo_n, hi_n) < k:
                    continue
                rng = r["__hi"] - r["__lo"]
                if best is None or rng > best[0]:
                    best = (rng, d, r["__med"])
            if best is not None:
                cuts[lab] = (best[1], best[2])
        if not cuts:
            break
        expr = F.col("__label") * 2
        for lab, (d, med) in cuts.items():
            expr = F.when(
                (F.col("__label") == lab) & (F.col(f"__q{d}") > med),
                F.col("__label") * 2 + 1,
            ).otherwise(expr)
        work = work.withColumn(
            "__label", expr.cast("long")
        ).localCheckpoint(eager=True)

    bounds = work.groupBy("__label").agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        *[f(F.col(f"__q{d}")).alias(f"__{side}{d}")
          for d in range(n_dims)
          for side, f in (("lo", F.min), ("hi", F.max))],
    )
    out_cols = [F.col("__id").alias(id_col)]
    for d, c in enumerate(qi_cols):
        out_cols.append(F.col(f"__lo{d}").alias(f"{c}_lo"))
        out_cols.append(F.col(f"__hi{d}").alias(f"{c}_hi"))
    out_cols.append(F.col("class_size"))
    return work.join(bounds, "__label").select(*out_cols)
