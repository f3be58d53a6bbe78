"""Distributed descriptive statistics: exact grouped medians, moment-based
stddev/correlation, histograms, and rolling time-window aggregates.

These are the profiling primitives a training-data pipeline runs before and
after curation (quality-score distributions, per-shard balance checks,
activity baselines for anomaly detection). The reference has only COUNT/MAX
aggregates (src/CopyAction.scala:88, src/DbCopier.scala setval max); this
module is part of the §2.12 extension surface.

Determinism contract (cross-engine, see queries.py module docstring):

* Sums accumulate in DECIMAL (exact, order-independent) and are cast to
  DOUBLE once. Variance/correlation then use ONLY IEEE-deterministic steps
  on those identical doubles: products, subtraction, division, and sqrt
  (correctly rounded by IEEE 754, unlike transcendental functions).
* Medians select actual middle elements by row_number (no interpolation
  beyond an n/1 or n/2 division of identical doubles).
* Histogram bins are integer arithmetic on exact decimal cents.

Scale notes (100 TB):

* ``grouped_median`` is one shuffle on the group key + a window sort within
  each group — the same cost as any grouped sort. No driver collection.
* ``moments``/``corr_pair`` are single-pass partial aggregations
  (map-side combine): sums of x, x², y, y², xy — the classic distributive
  decomposition, so they scale like a plain groupBy-sum.
* ``rolling_time_agg`` is one shuffle on the partition key; the RANGE frame
  is evaluated with a single sort per partition. Skewed entities (one user
  with millions of events) serialize within their partition — cap or
  pre-split hot entities upstream if that arises.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dec(c: Column, precision: int = 12, scale: int = 2) -> Column:
    return c.cast(f"decimal({precision},{scale})")


def grouped_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tie_col: str,
) -> DataFrame:
    """Exact per-group median of ``value_col`` (as DECIMAL(12,2) cents).

    Selects the middle element (odd n) or the two middle elements (even n)
    by row_number over a (value, tie_col) sort, then averages them as
    ``sum_decimal_as_double / n_selected`` — a division of identical
    doubles by 1.0 or 2.0, hence bit-identical across engines.

    One shuffle (group key) + one window sort. No interpolation: the
    median is always derived from actual data values.
    """
    v = _dec(F.col(value_col))
    w = Window.partitionBy(*group_cols).orderBy(F.col("__v"), F.col(tie_col))
    cw = Window.partitionBy(*group_cols)
    ranked = df.select(*group_cols, v.alias("__v"), F.col(tie_col)).select(
        *group_cols,
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(cw).alias("__n"),
    )
    # Middle positions with floor semantics: odd n selects one element
    # ((n+1)//2 == n//2+1), even n selects both middles (n//2 and n//2+1).
    # floor of a double division of ints < 2^53 is exact.
    lo_mid = F.floor((F.col("__n") + 1) / 2)
    hi_mid = F.floor(F.col("__n") / 2) + 1
    mid = ranked.where(
        (F.col("__rn") == lo_mid) | (F.col("__rn") == hi_mid)
    )
    return (
        mid.groupBy(*group_cols)
        .agg(
            F.sum("__v").cast("double").alias("__sum"),
            F.count(F.lit(1)).cast("double").alias("__k"),
            F.max("__n").cast("long").alias("n_rows"),
        )
        .select(
            *group_cols,
            (F.col("__sum") / F.col("__k")).alias("median"),
            "n_rows",
        )
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tie_col: str,
    c: int = 3,
) -> DataFrame:
    """Robust per-group outlier report via the Median Absolute Deviation —
    the breakdown-resistant counterpart of the 3-sigma rule (one wild
    value corrupts mean AND stddev; the median/MAD pair shrugs it off).

    A row is an outlier when ``|v - median| > c * MAD``. Everything runs
    in integer cent units with doubled/quadrupled scaling so medians of
    even-sized groups stay exact integers: ``m2 = 2*median`` (cents),
    ``dev2 = |2*v - m2|``, ``mad4 = 2*median(dev2) = 4*MAD``, and the
    flag is the pure integer comparison ``2*dev2 > c*mad4``. The only
    IEEE ops are the two output divisions by constants.

    Output: ``*group_cols, n_rows, n_outliers (int64), median, mad
    (double)``.

    Scale (100 TB): two rank passes ((value, tie) then (dev, tie)) —
    each one shuffle on the group key and one window sort — plus a
    broadcast of the group-sized median/MAD tables back onto the rows.
    Same cost class as two grouped_median calls; no driver state.
    """
    u = (_dec(F.col(value_col)) * 100).cast("long")
    rows = df.select(*group_cols, u.alias("__u"), F.col(tie_col).alias("__t"))
    w = Window.partitionBy(*group_cols).orderBy("__u", "__t")
    cw = Window.partitionBy(*group_cols)
    ranked = rows.select(
        *group_cols, "__u", "__t",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(cw).alias("__n"),
    )
    lo = F.floor((F.col("__n") + 1) / 2)
    hi = F.floor(F.col("__n") / 2) + 1
    med = (
        ranked.where((F.col("__rn") == lo) | (F.col("__rn") == hi))
        .groupBy(*group_cols)
        .agg(F.sum("__u").alias("__s"), F.count(F.lit(1)).alias("__k"),
             F.max("__n").cast("long").alias("n_rows"))
        .select(
            *group_cols, "n_rows",
            F.when(F.col("__k") == 1, 2 * F.col("__s"))
            .otherwise(F.col("__s")).alias("__m2"),
        )
    )
    devs = rows.join(F.broadcast(med), list(group_cols)).select(
        *group_cols, "__u", "__t", "__m2", "n_rows",
        F.abs(2 * F.col("__u") - F.col("__m2")).alias("__dev2"),
    )
    w2 = Window.partitionBy(*group_cols).orderBy("__dev2", "__t")
    ranked2 = devs.select(
        *group_cols, "__dev2", "__m2", "n_rows",
        F.row_number().over(w2).alias("__rn"),
        F.count(F.lit(1)).over(cw).alias("__n"),
    )
    mad = (
        ranked2.where((F.col("__rn") == lo) | (F.col("__rn") == hi))
        .groupBy(*group_cols)
        .agg(F.sum("__dev2").alias("__s"), F.count(F.lit(1)).alias("__k"))
        .select(
            *group_cols,
            F.when(F.col("__k") == 1, 2 * F.col("__s"))
            .otherwise(F.col("__s")).alias("__mad4"),
        )
    )
    flagged = devs.join(F.broadcast(mad), list(group_cols)).select(
        *group_cols, "n_rows", "__m2", "__mad4",
        (2 * F.col("__dev2") > c * F.col("__mad4")).cast("long")
        .alias("__is_out"),
    )
    return (
        flagged.groupBy(*group_cols)
        .agg(
            F.max("n_rows").cast("long").alias("n_rows"),
            F.sum("__is_out").cast("long").alias("n_outliers"),
            F.max("__m2").alias("__m2"),
            F.max("__mad4").alias("__mad4"),
        )
        .select(
            *group_cols, "n_rows", "n_outliers",
            (F.col("__m2").cast("double") / F.lit(200.0)).alias("median"),
            (F.col("__mad4").cast("double") / F.lit(400.0)).alias("mad"),
        )
    )


def moments(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group n, mean, sample stddev, min, max — single-pass.

    stddev uses the moment identity ``(n*Σx² − (Σx)²) / (n*(n−1))`` with
    Σx and Σx² accumulated as DECIMAL (exact), converted to DOUBLE once,
    and combined with IEEE-deterministic double ops + sqrt. Negative
    epsilon from the double subtraction is clamped to 0 before sqrt.

    Numerical contract: the single-pass identity cancels catastrophically
    when stddev << |mean| — absolute stddev error is ~2^-25·|mean|·sqrt(n)
    (square root of the accumulated double rounding of the mean² terms). The
    result is still bit-identical across engines (the oracle mirrors the
    exact op sequence); callers needing tighter accuracy near zero
    variance should run the two-pass form (mean first, then Σ(x−mean)²).
    """
    v = _dec(F.col(value_col))
    # (12,2)² -> (25,4); the sum is given headroom to (38,4).
    v2 = (v * v).cast("decimal(38,4)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("double").alias("__s"),
        F.sum(v2).cast("double").alias("__s2"),
        F.min(v).cast("double").alias("min_v"),
        F.max(v).cast("double").alias("max_v"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("__s2") - F.col("__s") * F.col("__s")
    var = F.greatest(num, F.lit(0.0)) / (n * (n - F.lit(1.0)))
    return agg.select(
        *group_cols,
        "n",
        (F.col("__s") / n).alias("mean_v"),
        F.when(F.col("n") > 1, F.sqrt(var)).alias("stddev_v"),
        "min_v",
        "max_v",
    )


def corr_pair(
    df: DataFrame, group_cols: Sequence[str], x_col: str, y_col: str
) -> DataFrame:
    """Per-group Pearson correlation via exact co-moment sums.

    Σx, Σy, Σx², Σy², Σxy all in DECIMAL; the final combination is pure
    double products/divisions/sqrt on identical inputs. Groups with zero
    variance on either side emit NULL.
    """
    x = _dec(F.col(x_col))
    y = _dec(F.col(y_col))
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum(y).cast("double").alias("__sy"),
        F.sum((x * x).cast("decimal(38,4)")).cast("double").alias("__sxx"),
        F.sum((y * y).cast("decimal(38,4)")).cast("double").alias("__syy"),
        F.sum((x * y).cast("decimal(38,4)")).cast("double").alias("__sxy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        *group_cols,
        "n",
        F.when((vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy)))
        .alias("corr_xy"),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bin_width_cents: int,
    extra_group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram over a money-like column.

    The bin index is ``(value_as_exact_cents) div bin_width_cents`` —
    DECIMAL(12,2)*100 is exact, the BIGINT cast is exact, and integer
    division is engine-identical (values assumed non-negative). Emits bin
    bounds in cents plus the count. Map-side combinable: scales like any
    groupBy-count.
    """
    cents = (_dec(F.col(value_col)) * 100).cast("bigint")
    binned = df.select(
        *extra_group_cols,
        (cents - cents % F.lit(bin_width_cents)).alias("bin_lo_cents"),
    )
    return (
        binned.groupBy(*extra_group_cols, "bin_lo_cents")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            *extra_group_cols,
            "bin_lo_cents",
            (F.col("bin_lo_cents") + F.lit(bin_width_cents)).alias(
                "bin_hi_cents"
            ),
            "n_rows",
        )
    )


def rolling_time_agg(
    df: DataFrame,
    part_col: str,
    ts_us_col: Column,
    value_col: str,
    id_col: str,
    preceding_us: int,
) -> DataFrame:
    """Per-row rolling aggregate over a trailing time range.

    RANGE BETWEEN ``preceding_us`` PRECEDING AND CURRENT ROW on an
    epoch-microsecond sort key — current row and all timestamp peers
    included (identical frame semantics in Spark and DuckDB). The value sum
    accumulates in DECIMAL so peer-order never affects the result.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col("__ts_us"))
        .rangeBetween(-preceding_us, 0)
    )
    vdec = _dec(F.col(value_col), 18, 6)
    return (
        df.select(
            part_col,
            F.col(id_col),
            ts_us_col.alias("__ts_us"),
            vdec.alias("__v"),
        )
        .select(
            part_col,
            id_col,
            F.col("__ts_us").alias("ts_us"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
            F.sum("__v").over(w).cast("double").alias("sum_trailing"),
        )
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tie_col: str,
    quantiles: Sequence[tuple[int, int]] = ((1, 4), (2, 4), (3, 4)),
) -> DataFrame:
    """Exact linearly-interpolated quantiles (SQL ``quantile_cont`` / type-7)
    per group, one output row per (group, quantile).

    Each quantile is a RATIONAL num/den pair so the rank arithmetic stays
    integer-exact: the continuous position is ``(n-1)*num/den``, split into
    ``lo = (n-1)*num // den`` (0-based) and the remainder fraction
    ``frac = ((n-1)*num % den) / den``. The interpolation
    ``v_lo + (v_hi - v_lo) * frac`` is three IEEE double ops on identical
    inputs — deterministic cross-engine (no transcendentals).

    Scale: one shuffle + one window sort per group (shared by ALL requested
    quantiles — the ranked frame is reused), then a filter keeping at most
    2*len(quantiles) rows per group. Same cost shape as grouped_median.
    """
    v = _dec(F.col(value_col))
    w = Window.partitionBy(*group_cols).orderBy(F.col("__v"), F.col(tie_col))
    cw = Window.partitionBy(*group_cols)
    ranked = df.select(*group_cols, v.alias("__v"), F.col(tie_col)).select(
        *group_cols,
        F.col("__v").cast("double").alias("__vd"),
        (F.row_number().over(w) - 1).alias("__i"),  # 0-based
        F.count(F.lit(1)).over(cw).alias("__n"),
    )
    out = None
    for num, den in quantiles:
        # All rank arithmetic in exact integers — no float floor, whose
        # rounding can mis-bin exactly-divisible positions.
        pos = (F.col("__n") - 1) * num
        rem = pos % den
        lo = (pos - rem) / den  # exact: numerator is a multiple of den
        picked = ranked.where(
            (F.col("__i") == lo) | ((F.col("__i") == lo + 1) & (rem > 0))
        )
        # v_lo + (v_hi - v_lo) * frac; when rem == 0 only v_lo is selected
        # and frac is 0, so the quantile is that value exactly.
        # r12: picked holds at most the rank-lo and rank-lo+1 rows per
        # group (row_number is unique), so the bracket values fall out of
        # CONDITIONAL min aggregates on plain doubles instead of
        # min/max over (rank, value) structs — struct-typed aggregation
        # buffers can't hash-aggregate and forced a SortAggregate
        # fallback (partial+final, per quantile branch). Identical
        # operands reach the interpolation, so results are bit-equal.
        rem_out = ((F.col("n_rows") - 1) * num) % den
        v_lo = F.min(F.when(F.col("__i") == lo, F.col("__vd")))
        v_hi = F.min(F.when(F.col("__i") == lo + 1, F.col("__vd")))
        q = picked.groupBy(*group_cols).agg(
            v_lo.alias("__vlo"),
            v_hi.alias("__vhi"),
            F.max("__n").cast("long").alias("n_rows"),
        ).select(
            *group_cols,
            F.lit(num * 100 // den).cast("long").alias("q_pct"),
            (
                F.col("__vlo")
                + (F.coalesce(F.col("__vhi"), F.col("__vlo"))
                   - F.col("__vlo"))
                * (rem_out.cast("double") / F.lit(float(den)))
            ).alias("quantile"),
            "n_rows",
        )
        out = q if out is None else out.unionByName(q)
    return out


def key_skew_profile(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Join/aggregation-key skew report: the top-n hottest key values with
    their absolute counts and share of the table (exact-int division).

    This is the pre-flight check for the skew playbook (operators/skew.py)
    — at 100 TB you run it on a sample or the full table (one map-side-
    combinable count) BEFORE choosing salting factors. Output is top-n via
    TakeOrderedAndProject (no full sort), tie-broken by key value.
    """
    total = df.groupBy().agg(F.count(F.lit(1)).cast("long").alias("__total"))
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("key_count")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "key_count",
            (F.col("key_count").cast("double")
             / F.col("__total").cast("double")).alias("key_share"),
        )
        .orderBy(F.desc("key_count"), F.asc(key_col))
        .limit(top_n)
    )


def running_distinct(
    df: DataFrame,
    part_col: str,
    entity_col: str,
    order_cols: Sequence[str],
    partitions: int | None = None,
) -> DataFrame:
    """Running COUNT(DISTINCT entity) over an ordered stream — a window
    Spark has no native form for. Decomposed as first-occurrence flags
    (row_number == 1 per (partition, entity)) cumulatively summed over the
    stream order; both passes share the same total order so the result is
    deterministic. Emits the input rows plus ``n_distinct_so_far``.

    Scale (100 TB): ``part_col`` is typically a BOUNDED key (event type,
    status), so a plain cumulative window over it would funnel one
    group's ENTIRE history through a single window task. The cumulative
    sum therefore runs as the engine's grouped two-pass prefix sum
    (``global_ranks`` shape): range-repartition on ``(part, order)``,
    windowed sum within each (partition-slice, group), per-slice flag
    totals rolled into exclusive per-group bases by a window over the
    TOTALS table (at most ``partitions`` rows per group — never the
    data), broadcast back. Output-identical to the naive window by the
    prefix-sum property; the entity first-occurrence window partitions
    by (part, entity) — unbounded key space, never a funnel. The ranged
    projection is eagerly localCheckpoint-ed: both references to
    ``spark_partition_id()`` must observe the same physical slicing.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    order = [F.col(c) for c in order_cols]
    w_first = Window.partitionBy(part_col, entity_col).orderBy(*order)
    flagged = df.withColumn(
        "__first", F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    )
    # Eager localCheckpoint, not .cache() (r13): the two references to
    # spark_partition_id() must agree, and a checkpoint PINS the computed
    # rows (cache relies on recompute determinism under eviction and
    # leaked a pinned corpus-sized entry for the session lifetime — the
    # RDD behind a checkpoint is released when the plan is GC'd).
    ranged = (
        flagged.repartitionByRange(partitions, F.col(part_col), *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = (
        Window.partitionBy("__pid", part_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__cum", F.sum("__first").over(w_local))
    w_base = (
        Window.partitionBy("__bg")
        .orderBy("__bpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        ranged.groupBy(
            F.col("__pid").alias("__bpid"), F.col(part_col).alias("__bg")
        )
        .agg(F.sum("__first").alias("__t"))
        .select(
            "__bpid",
            "__bg",
            F.coalesce(F.sum("__t").over(w_base), F.lit(0)).alias("__base"),
        )
    )
    return (
        local.join(
            F.broadcast(bases),
            (F.col("__pid") == F.col("__bpid"))
            & F.col(part_col).eqNullSafe(F.col("__bg")),
        )
        .withColumn(
            "n_distinct_so_far",
            (F.col("__base") + F.col("__cum")).cast("long"),
        )
        .drop("__first", "__pid", "__cum", "__bpid", "__bg", "__base")
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tie_col: str,
    lo: tuple[int, int] = (5, 100),
    hi: tuple[int, int] = (95, 100),
) -> DataFrame:
    """Winsorize (clip) values at per-group quantiles — the standard
    outlier treatment before training on heavy-tailed features.

    Bounds come from ``grouped_quantiles`` (exact type-7, deterministic),
    pivoted to one row per group and broadcast back onto the rows; the
    clip is ``least(greatest(v, lo), hi)`` on engine-identical doubles.
    Cost: the quantile pass + one broadcast join — rows never shuffle.
    """
    lo_pct = lo[0] * 100 // lo[1]
    hi_pct = hi[0] * 100 // hi[1]
    q = grouped_quantiles(df, group_cols, value_col, tie_col, [lo, hi])
    bounds = q.groupBy(*group_cols).agg(
        F.max(F.when(F.col("q_pct") == lo_pct, F.col("quantile"))).alias("__qlo"),
        F.max(F.when(F.col("q_pct") == hi_pct, F.col("quantile"))).alias("__qhi"),
    )
    v = _dec(F.col(value_col)).cast("double")
    return df.join(F.broadcast(bounds), list(group_cols)).select(
        F.col(tie_col),
        *group_cols,
        v.alias("value"),
        F.least(F.greatest(v, F.col("__qlo")), F.col("__qhi"))
        .alias("winsorized"),
        (v < F.col("__qlo")).alias("clipped_low"),
        (v > F.col("__qhi")).alias("clipped_high"),
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the UNBINNED
    supremum distance ``sup_v |F_a(v) - F_b(v)|`` (``distribution_drift``
    is the binned total-variation counterpart; KS needs no bin-width
    choice and catches shifts TVD's bins can straddle).

    Exactness: the supremum is found in pure integers —
    ``max |cum_a * n_b - cum_b * n_a|`` over distinct values (valid while
    ``n_a * n_b < 2^63``, i.e. both sides under ~3e9 rows) — and ONE
    IEEE division produces the score. Output: one row ``(n_a, n_b,
    ks (double), ks_at (double — the smallest value attaining it))``.

    Scale (100 TB): per-value counts are map-side combinable down to the
    distinct-value table; cumulative counts use the equi-depth
    histogram's distributed two-pass prefix sum (range-repartition,
    per-partition running sums, one P-row collect, broadcast exclusive
    prefixes) instead of a single-reducer global window.
    """
    spark = df_a.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    cents = (_dec(F.col(value_col)) * 100).cast("long")
    tagged = df_a.select(
        cents.alias("__v"), F.lit(1).alias("__a"), F.lit(0).alias("__b")
    ).unionAll(df_b.select(
        cents.alias("__v"), F.lit(0).alias("__a"), F.lit(1).alias("__b")
    ))
    per_v = tagged.groupBy("__v").agg(
        F.sum("__a").cast("long").alias("__na"),
        F.sum("__b").cast("long").alias("__nb"),
    )
    ranged = (
        per_v.repartitionByRange(partitions, F.col("__v"))
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    w = (
        Window.partitionBy("__pid").orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "__pid", "__v",
        F.sum("__na").over(w).alias("__ca_local"),
        F.sum("__nb").over(w).alias("__cb_local"),
    )
    totals = sorted(
        (r["__pid"], r["sa"], r["sb"])
        for r in ranged.groupBy("__pid")
        .agg(F.sum("__na").alias("sa"), F.sum("__nb").alias("sb"))
        .collect()
    )
    schema = "n_a long, n_b long, ks double, ks_at double"
    n_a = sum(t[1] for t in totals)
    n_b = sum(t[2] for t in totals)
    if n_a == 0 or n_b == 0:
        ranged.unpersist()
        return spark.createDataFrame([], schema)
    prefix_rows, run_a, run_b = [], 0, 0
    for pid, sa, sb in totals:
        prefix_rows.append((pid, run_a, run_b))
        run_a += sa
        run_b += sb
    prefix = spark.createDataFrame(
        prefix_rows, "__pid int, __base_a long, __base_b long"
    )
    diffs = local.join(F.broadcast(prefix), "__pid").select(
        "__v",
        F.abs(
            (F.col("__ca_local") + F.col("__base_a")) * F.lit(n_b)
            - (F.col("__cb_local") + F.col("__base_b")) * F.lit(n_a)
        ).alias("__diff"),
    )
    top = diffs.agg(
        F.max(F.struct(F.col("__diff"), (-F.col("__v")).alias("__nv")))
        .alias("__m")
    ).select(
        F.col("__m.__diff").alias("__md"), (-F.col("__m.__nv")).alias("__mv")
    ).collect()[0]
    ranged.unpersist()
    return spark.createDataFrame(
        [(
            n_a, n_b,
            float(top["__md"]) / float(n_a * n_b),
            float(top["__mv"]) / 100.0,
        )],
        schema,
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bin_width_cents: int,
) -> DataFrame:
    """Total-variation drift between two snapshots of a value column:
    ``TVD = 1/2 * Σ_bins |p_bin − q_bin|`` over shared fixed-width bins.

    Float-determinism subtlety: summing per-bin double differences is
    ORDER-DEPENDENT and thus not engine-stable. Instead the sum runs in
    exact integers — ``Σ |n_a·total_b − n_b·total_a|`` — and one final
    double division by ``2·total_a·total_b`` produces the score. Output:
    one row ``(n_bins, total_a, total_b, tvd)``.

    Scale: two histogram passes (combinable) + a full-outer join on the
    bin id (bins number in the hundreds — trivially broadcastable).
    """
    ha = histogram(df_a, value_col, bin_width_cents).select(
        "bin_lo_cents", F.col("n_rows").alias("__na")
    )
    hb = histogram(df_b, value_col, bin_width_cents).select(
        F.col("bin_lo_cents").alias("__bin_b"), F.col("n_rows").alias("__nb")
    )
    joined = ha.join(
        hb, ha.bin_lo_cents == hb.__bin_b, "full_outer"
    ).select(
        F.coalesce(F.col("__na"), F.lit(0)).alias("na"),
        F.coalesce(F.col("__nb"), F.lit(0)).alias("nb"),
    )
    # Totals via a global window over the BIN rows — bounded (hundreds of
    # bins), so the single-partition window is not a scale concern here.
    w = Window.partitionBy()
    with_tot = joined.select(
        "na", "nb",
        F.sum("na").over(w).alias("__ta"),
        F.sum("nb").over(w).alias("__tb"),
    )
    agg = with_tot.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.max("__ta").cast("long").alias("total_a"),
        F.max("__tb").cast("long").alias("total_b"),
        F.sum(F.abs(F.col("na") * F.col("__tb") - F.col("nb") * F.col("__ta")))
        .cast("long").alias("__num"),
    )
    return agg.select(
        "n_bins", "total_a", "total_b",
        (
            F.col("__num").cast("double")
            / (F.lit(2.0) * (F.col("total_a") * F.col("total_b")).cast("double"))
        ).alias("tvd"),
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    n_bins: int = 10,
    partitions: int | None = None,
    cache_owner: list | None = None,
) -> DataFrame:
    """Exact equi-depth (equal-frequency) histogram: rows are ranked under
    the total order ``(value, tie)`` and row of global rank ``r`` (0-based)
    lands in bin ``(r * n_bins) div n`` — bins differ in width, not count
    (the optimizer-statistics / feature-binning shape; ``histogram`` is
    the equal-WIDTH counterpart). Output: ``bin, n_rows, lo, hi`` with
    decimal-exact double bin edges.

    The global rank would be the classic ``Window.orderBy`` single-reducer
    trap; instead it reuses ``pack_sequences``' distributed two-pass
    prefix sum: range-repartition on the order key, rank within each
    partition, collect ONE row-count per partition, and broadcast-join the
    exclusive prefix back. Result is identical to the global rank because
    range partitions are contiguous under the same total order.

    Cache ownership: the ranged projection must stay pinned between the
    per-partition count collect and the ranked join (partition ids have to
    agree across the two jobs). With ``cache_owner`` given, the caller
    unpersists (pack_sequences contract, result stays lazy). With
    ``cache_owner=None`` the function owns it: the histogram — at most
    ``n_bins`` rows — is materialized eagerly, the cache released, and a
    local DataFrame returned, so repeated invocations leak nothing.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    v = _dec(F.col(value_col))
    ranged = (
        df.select(v.alias("__v"), F.col(tie_col).alias("__t"))
        .repartitionByRange(partitions, F.col("__v"), F.col("__t"))
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col("__v"), F.col("__t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "__local_r", F.count(F.lit(1)).over(w) - 1
    )
    totals = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    if cache_owner is not None:
        cache_owner.append(ranged)
    schema = "bin long, n_rows long, lo double, hi double"
    n = sum(c for _, c in totals)
    if n == 0:
        if cache_owner is None:
            ranged.unpersist()
        return spark.createDataFrame([], schema)
    prefix_rows, running = [], 0
    for pid, c in totals:
        prefix_rows.append((pid, running))
        running += c
    prefix_df = spark.createDataFrame(prefix_rows, "__pid int, __base long")
    ranked = local.join(F.broadcast(prefix_df), "__pid").select(
        "__v", (F.col("__local_r") + F.col("__base")).alias("__r")
    )
    hist = (
        # integer `div`, not `/`: float division's correct rounding can
        # cross an integer boundary at extreme n (CLAUDE.md float rule)
        ranked.select(
            F.expr(f"CAST((__r * {n_bins}) div {n} AS BIGINT)").alias("bin"),
            "__v",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__v").cast("double").alias("lo"),
            F.max("__v").cast("double").alias("hi"),
        )
    )
    if cache_owner is None:
        rows = [(r["bin"], r["n_rows"], r["lo"], r["hi"])
                for r in hist.collect()]
        ranged.unpersist()
        return spark.createDataFrame(rows, schema)
    return hist


def global_ranks(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    partitions: int | None = None,
    cache_owner: list | None = None,
) -> tuple[DataFrame, int]:
    """Exact 0-based dense global rank under the total order ``(value,
    tie)`` — the distributed two-pass prefix-sum rank (range-repartition,
    rank within partitions, collect ONE count per partition, broadcast
    the exclusive prefixes back), never a single-reducer global window.
    Same ``cache_owner`` contract as ``pack_sequences``: the ranged
    projection must stay pinned while the returned plan is alive — the
    cache is CORRECTNESS-bearing (repartitionByRange samples, so an
    uncached recompute could draw different partition boundaries than
    the collected totals). With ``cache_owner=None`` the pin simply
    lives until LRU eviction or session end: fine for run-once queries
    and bench sweeps; a long-lived service should pass a list and
    unpersist after consuming the result.

    Returns ``(DataFrame(tie_col, value_col, __rank), n_rows)``.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    ranged = (
        df.select(F.col(value_col).alias("__v"), F.col(tie_col).alias("__t"))
        .repartitionByRange(partitions, F.col("__v"), F.col("__t"))
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    if cache_owner is not None:
        cache_owner.append(ranged)
    w = Window.partitionBy("__pid").orderBy(F.col("__v"), F.col("__t"))
    local = ranged.withColumn(
        "__local_rank", F.row_number().over(w).cast("long") - 1
    )
    totals = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = sum(c for _, c in totals)
    prefix_rows, acc = [], 0
    for pid, c in totals:
        prefix_rows.append((pid, acc))
        acc += c
    prefixes = spark.createDataFrame(
        prefix_rows or [(0, 0)], "__pid int, __prefix long"
    )
    ranked = (
        local.join(F.broadcast(prefixes), "__pid")
        .select(
            F.col("__t").alias(tie_col),
            F.col("__v").alias(value_col),
            (F.col("__prefix") + F.col("__local_rank")).alias("__rank"),
        )
    )
    return ranked, n


def quantile_transform(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Empirical-CDF feature scaling: every row maps to its exact global
    quantile position ``rank / (n-1)`` in [0, 1] under the (value, tie)
    total order — the rank-based normalization that makes a feature
    distribution-free before training.

    Output: ``<tie_col>, <value_col>, rank (int64 0-based), q (double —
    one IEEE division; 0.0 for a single-row input)``.

    Scale (100 TB): the rank is ``global_ranks``' distributed two-pass
    prefix sum. The output is row-per-input, so instead of the
    materialize-and-release trick of the small-output consumers, the
    ranked result is pinned with ``localCheckpoint`` (stable partition
    ids no longer needed afterwards) and the range cache released
    eagerly — callers hold a leak-free distributed frame.
    """
    own: list = []
    ranked, n = global_ranks(df, value_col, tie_col, partitions,
                             cache_owner=own)
    pinned = ranked.localCheckpoint(eager=True)
    for c in own:
        c.unpersist()
    q = (
        F.lit(0.0) if n <= 1
        else F.col("rank").cast("double") / F.lit(float(n - 1))
    )
    return pinned.select(
        tie_col,
        value_col,
        F.col("__rank").cast("long").alias("rank"),
    ).select(tie_col, value_col, "rank", q.alias("q"))


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    n_buckets: int,
    partitions: int | None = None,
    cache_owner: list | None = None,
) -> DataFrame:
    """Per-row equal-frequency bucket (0-based): global rank ``r`` under
    the total order ``(value, tie)`` lands in ``(r * n_buckets) div n`` —
    the per-row counterpart of ``equi_depth_histogram``, built on
    :func:`global_ranks` (same cache contract).

    Output: ``tie_col, value_col, bucket`` — join back on the unique tie
    key to attach the bucket to full rows.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    ranked, n = global_ranks(df, value_col, tie_col, partitions, cache_owner)
    return ranked.select(
        tie_col,
        value_col,
        F.expr(f"__rank * {n_buckets} div {max(n, 1)}")
        .cast("long").alias("bucket"),
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n: int = 4,
    cache_owner: list | None = None,
) -> DataFrame:
    """RFM segmentation: per-customer Recency / Frequency / Monetary
    metrics, each scored 1..n by equal-frequency quantile bucket (higher
    is better on all three; ties broken by customer key).

    The classic formulation is three ``ntile()`` calls over one global
    window — a single-reducer sort three times over. Here each metric
    buckets through :func:`quantile_buckets`' distributed rank, on the
    per-customer aggregate (already |customers|-sized, far smaller than
    the order log).

    Output: ``customer, recency_us, frequency, monetary, r_score,
    f_score, m_score, rfm`` (``rfm`` = 100*r + 10*f + m).
    """
    per_cust = orders.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(F.unix_micros(F.col(date_col).cast("timestamp")))
        .alias("recency_us"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(_dec(F.col(amount_col)).cast("decimal(38,4)"))
        .cast("double").alias("monetary"),
        # Referenced four times (output + three bucketers): pin the
        # aggregate so the order log scans once, not four times.
    ).localCheckpoint(eager=False)
    out = per_cust
    for metric, score in (("recency_us", "r_score"), ("frequency", "f_score"),
                          ("monetary", "m_score")):
        buckets = quantile_buckets(
            per_cust, metric, "customer", n, cache_owner=cache_owner
        ).select("customer", (F.col("bucket") + 1).alias(score))
        out = out.join(buckets, "customer")
    return out.select(
        "customer", "recency_us", "frequency", "monetary",
        "r_score", "f_score", "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long").alias("rfm"),
    )


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line (closed form) over
    INTEGER x/y columns — the per-entity "is this metric drifting"
    primitive (per-customer spend trend, per-source quality trend).

    One hash aggregation computes the five sufficient statistics
    ``n, sum(x), sum(y), sum(x*y), sum(x^2)`` — partial map-side combine,
    one shuffle on the group key, no window, no sort: the shape that
    holds at any group cardinality. Sums accumulate in DECIMAL(38,0)
    (exact at any realistic scale; int64 products would overflow first at
    ~1e18), and the closed form

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy - slope*Sx) / n

    computes numerator and denominator EXACTLY in decimal before the one
    double division — both engines divide identical operands, so the
    doubles match bit-for-bit (the engine-wide DECIMAL accumulation
    rule). R² follows as ``(num/den) * (num/syy_den)`` — two divisions
    of the same exact operands, never ``num²`` (which would overflow 38
    digits). Degenerate groups (all x equal, or all y equal) emit NULL
    slope/intercept/r_squared rather than Inf.

    Output: ``*group_cols, n_points long, slope double, intercept
    double, r_squared double``.
    """
    d0 = "decimal(38,0)"
    x = F.col(x_col).cast(d0)
    y = F.col(y_col).cast(d0)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(x).cast(d0).alias("__sx"),
        F.sum(y).cast(d0).alias("__sy"),
        F.sum(x * y).cast(d0).alias("__sxy"),
        F.sum(x * x).cast(d0).alias("__sxx"),
        F.sum(y * y).cast(d0).alias("__syy"),
    )
    n = F.col("n_points").cast(d0)
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(d0)
    den = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(d0)
    yden = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(d0)
    slope = F.when(den != 0, num.cast("double") / den.cast("double"))
    intercept = F.when(
        den != 0,
        (F.col("__sy").cast("double") - slope * F.col("__sx").cast("double"))
        / F.col("n_points").cast("double"),
    )
    r2 = F.when(
        (den != 0) & (yden != 0),
        (num.cast("double") / den.cast("double"))
        * (num.cast("double") / yden.cast("double")),
    )
    return agg.select(
        *group_cols, "n_points",
        slope.alias("slope"), intercept.alias("intercept"),
        r2.alias("r_squared"),
    )


def two_proportion_ztest(
    df: DataFrame,
    variant_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test over one boolean variant split — the A/B
    readout. ``variant_col`` is 0/1, ``success_col`` is 0/1 per unit.

    One aggregation produces the four exact integers (units and successes
    per arm); the z statistic is pure IEEE arithmetic on doubles derived
    from those integers (divisions of exact ints, one correctly-rounded
    sqrt) — deterministic across engines, no distributional tables
    needed. Callers compare ``abs(z)`` against their own critical value.

    Output (one row): ``n_a, conv_a, n_b, conv_b long; rate_a, rate_b,
    z_stat double`` (z NULL when either arm is empty or pooled rate is
    degenerate 0/1).
    """
    v = F.col(variant_col)
    s = F.col(success_col).cast("long")
    agg = df.agg(
        F.sum(F.when(v == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(v == 0, s).otherwise(0)).cast("long").alias("conv_a"),
        F.sum(F.when(v == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(v == 1, s).otherwise(0)).cast("long").alias("conv_b"),
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (pool > 0) & (pool < 1),
        (pb - pa) / se,
    )
    return agg.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.when(F.col("n_a") > 0, pa).alias("rate_a"),
        F.when(F.col("n_b") > 0, pb).alias("rate_b"),
        z.alias("z_stat"),
    )


def poisson1_thresholds(max_k: int = 8) -> list[int]:
    """Integer inverse-CDF thresholds for Poisson(1) on the 31-bit hash
    space: multiplicity k iff ``t_{k-1} <= h < t_k`` (h uniform on
    [0, 2^31)). Computed once in Python and embedded as the SAME integer
    literals in both engines, so the bootstrap kernel is pure integer
    compares — no float in either engine's hot path. The tail above
    ``t_{max_k}`` (cumulative mass ~1e-6 at max_k=8) maps to
    ``max_k + 1``."""
    import math

    acc, fact, out = 0.0, 1.0, []
    for k in range(max_k + 1):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        out.append(min(int(acc * 2_147_483_648.0), 2_147_483_648))
    return out


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_resamples: int = 32,
    salt: str = "__boot",
) -> DataFrame:
    """Poissonized bootstrap of the mean in ONE pass — error bars for
    pipeline metrics without B full resamples: each row's multiplicity in
    resample ``b`` is Poisson(1), drawn deterministically by integer
    inverse-CDF on the b-salted frozen hash (``poisson1_thresholds``;
    the ~1e-6 tail above the last threshold draws ``max_k + 1``).
    ``value_col`` must be exact integers (the cents rule); every
    resample mean is one double division of exact DECIMAL/long
    operands, so all B means — and the CI edges picked from their
    sorted order — are cross-engine deterministic.

    Shape: the resample index EXPLODES into rows (B x input in the map
    stage only — partial aggregation reduces each partition to B rows
    before the one B-group shuffle) and the multiplicity is a
    constant-size fold over the 9-threshold array literal. The obvious
    alternative — unrolling B hash+sum column pairs into one wide
    aggregate — executes just as fast but costs ~30 s of Catalyst
    PLANNING per fresh plan at B = 32 (the documented wide-literal-tree
    gotcha); this shape plans in milliseconds at any B.

    Output: one row per resample: ``resample int, n_drawn long,
    mean double`` (NULL mean for an empty resample — probability
    ~e^-n)."""
    from ..functions.hashing import _raw_hash
    from .dedup import ensure_parallelism

    if n_resamples < 1:
        raise ValueError("n_resamples must be >= 1")
    thresholds = poisson1_thresholds()
    # B x per-row hashing serializes onto one task on single-split inputs
    # (the fixture-file gotcha) — the guard is a no-op at real scale.
    base = ensure_parallelism(df.select(
        F.col(value_col).cast("decimal(38,0)").alias("__v"),
        F.col(id_col).cast("string").alias("__k"),
    )).select(
        "__v",
        F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1)))
        .alias("resample"),
        "__k",
    )
    salted = F.concat(F.col("__k"), F.lit(salt),
                      F.col("resample").cast("string"), F.lit("|"))
    hashed = base.select(
        "resample", "__v", _raw_hash(salted).alias("__h"))
    tarr = F.array(*[F.lit(t).cast("long") for t in thresholds])
    mult = F.aggregate(
        tarr, F.lit(0).cast("long"),
        lambda acc, t: acc + F.when(F.col("__h") >= t, 1).otherwise(0),
    ).cast("long")
    agg = (
        hashed.select("resample", "__v", mult.alias("__m"))
        .groupBy("resample")
        .agg(
            F.sum(F.col("__v") * F.col("__m").cast("decimal(38,0)"))
            .cast("decimal(38,0)").alias("__s"),
            F.sum("__m").cast("long").alias("n_drawn"),
        )
    )
    return agg.select(
        F.col("resample").cast("int").alias("resample"),
        "n_drawn",
        F.when(
            F.col("n_drawn") > 0,
            F.col("__s").cast("double") / F.col("n_drawn").cast("double"),
        ).alias("mean"),
    )



def chisq_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Pearson chi-squared test of independence over two categorical
    columns — the contingency-table readout next to the two-proportion
    z-test. One counting aggregation; the full R x C grid (INCLUDING
    zero-observed cells — standard chi-squared expects every cell) is a
    cross join of the two margin tables, each at most the category
    cardinality.

    Determinism: each cell's term is ``(o*n - rt*ct)^2 / (n*rt*ct)`` —
    numerator and denominator EXACT in DECIMAL(38,0), one double
    division per cell — and the statistic folds the terms in sorted
    (row, col) order via ``F.aggregate`` with a 0.0 init (``0.0 + t1 ==
    t1`` exactly, so the left fold matches DuckDB's init-free
    list_reduce bracketing). Never a shuffle-order float sum; the fold
    runs over at most R*C values in one row.

    Output (one row): ``n long, n_rows int, n_cols int, dof long,
    chi2 double``."""
    d0 = "decimal(38,0)"
    r, c = F.col(row_col), F.col(col_col)
    cells = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).cast("long").alias("__o"))
    rt = cells.groupBy(row_col).agg(F.sum("__o").cast("long").alias("__rt"))
    ct = cells.groupBy(col_col).agg(F.sum("__o").cast("long").alias("__ct"))
    tot = cells.agg(
        F.sum("__o").cast("long").alias("__n"),
        F.countDistinct(row_col).cast("int").alias("n_rows"),
        F.countDistinct(col_col).cast("int").alias("n_cols"),
    )
    grid = rt.crossJoin(ct).join(cells, [row_col, col_col], "left")
    full = grid.crossJoin(F.broadcast(tot)).select(
        row_col, col_col, "__rt", "__ct", "__n", "n_rows", "n_cols",
        F.coalesce(F.col("__o"), F.lit(0)).cast("long").alias("__o"),
    )
    num = (
        F.col("__o").cast(d0) * F.col("__n").cast(d0)
        - F.col("__rt").cast(d0) * F.col("__ct").cast(d0)
    ).cast(d0)
    den = (
        F.col("__n").cast(d0) * F.col("__rt").cast(d0)
        * F.col("__ct").cast(d0)
    ).cast(d0)
    term = (num * num).cast(d0).cast("double") / den.cast("double")
    with_terms = full.select(
        "__n", "n_rows", "n_cols", row_col, col_col, term.alias("__term"))
    folded = with_terms.groupBy("__n", "n_rows", "n_cols").agg(
        F.aggregate(
            F.sort_array(F.collect_list(
                F.struct(r.alias("r"), c.alias("c"),
                         F.col("__term").alias("t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("chi2")
    )
    return folded.select(
        F.col("__n").alias("n"), "n_rows", "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).cast("long")
        .alias("dof"),
        "chi2",
    )


def mannwhitney_u(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) over a 0/1 variant split — the
    NONPARAMETRIC A/B readout for skewed metrics (revenue, latency)
    where the two-proportion z-test needs a boolean and the t-test
    trusts means. Everything up to the final z is EXACT integer
    arithmetic on doubled midranks: per distinct value, ``2*midrank =
    2*s + t + 1`` (s = exclusive prefix count, t = tie size), so the
    doubled rank-sum ``R2_A = sum_v a(v) * (2 s(v) + t(v) + 1)`` and
    ``2*U_A = R2_A - n_a*(n_a+1)`` carry no floats; the tie-corrected
    normal approximation then divides doubles derived from those exact
    DECIMAL(38,0) sums in one fixed expression tree.

    The exclusive prefix over the per-value count table is the engine's
    distributed two-pass prefix sum (``global_ranks`` shape):
    range-repartition on value, windowed sum within partitions, ONE
    per-partition total collected, exclusive bases broadcast back —
    never a single-reducer global window, and the table has one row per
    DISTINCT value, not per input row.

    Output (one row): ``n_a long, n_b long, u2_a double (2*U_A),
    tie_groups long, z_stat double`` (z NULL when an arm is empty or the
    variance degenerates — e.g. every value tied)."""
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    v, var = F.col(value_col), F.col(variant_col)
    g = (
        df.where(var.isin(0, 1))
        .groupBy(v.alias("__v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__t"),
            F.sum(F.when(var == 0, 1).otherwise(0)).cast("long")
            .alias("__a"),
        )
    )
    ranged = (
        g.repartitionByRange(partitions, F.col("__v").asc())
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    w = (
        Window.partitionBy("__pid").orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__cum", F.sum("__t").over(w))
    totals = sorted(
        (r["__pid"], r["t"])
        for r in ranged.groupBy("__pid").agg(F.sum("__t").alias("t"))
        .collect()
    )
    prefix_rows, acc = [], 0
    for pid, t in totals:
        prefix_rows.append((pid, acc))
        acc += t or 0
    prefixes = spark.createDataFrame(
        prefix_rows or [(0, 0)], "__pid int, __base long"
    )
    d0 = "decimal(38,0)"
    s = (F.col("__base") + F.col("__cum") - F.col("__t")).cast(d0)
    t_ = F.col("__t").cast(d0)
    a_ = F.col("__a").cast(d0)
    agg = (
        local.join(F.broadcast(prefixes), "__pid")
        .agg(
            F.sum(F.col("__a")).cast("long").alias("n_a"),
            F.sum(F.col("__t") - F.col("__a")).cast("long").alias("n_b"),
            F.sum(a_ * (s * 2 + t_ + 1)).cast(d0).alias("__r2a"),
            F.sum(t_ * t_ * t_ - t_).cast(d0).alias("__ties"),
            F.sum(F.when(F.col("__t") > 1, 1).otherwise(0)).cast("long")
            .alias("tie_groups"),
        )
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u2a = (
        F.col("__r2a").cast("double")
        - F.col("n_a").cast("double") * (F.col("n_a").cast("double") + 1.0)
    )
    mean2 = na * nb
    var_u = (na * nb / F.lit(12.0)) * (
        (n + F.lit(1.0)) - F.col("__ties").cast("double") / (n * (n - F.lit(1.0)))
    )
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var_u > 0),
        (u2a - mean2) / (F.lit(2.0) * F.sqrt(var_u)),
    )
    out = agg.select(
        "n_a", "n_b", u2a.alias("u2_a"), "tie_groups", z.alias("z_stat")
    )
    pinned = out.localCheckpoint(eager=True)
    ranged.unpersist()
    return pinned


def welch_ttest(
    df: DataFrame,
    variant_col: str,
    value_col: str,
) -> DataFrame:
    """Welch's unequal-variance t-test over a 0/1 variant split — the
    mean-difference A/B readout between the proportion z-test (boolean
    outcomes) and Mann-Whitney (rank robustness). ``value_col`` must be
    exact integers (the cents rule).

    One aggregation produces the six exact per-arm sums; each sample
    variance is ``(n*Sxx - Sx^2) / (n*(n-1))`` with EXACT numerator, and
    t plus the Welch-Satterthwaite dof are pure IEEE arithmetic on
    those identical doubles. Output (one row): ``n_a, n_b long; mean_a,
    mean_b, var_a, var_b, t_stat, dof double`` (t/dof NULL when either
    arm has < 2 units or both variances are 0)."""
    d0 = "decimal(38,0)"
    var, v = F.col(variant_col), F.col(value_col).cast(d0)
    agg = df.where(var.isin(0, 1)).agg(
        F.sum(F.when(var == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(var == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(var == 0, v).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__sa"),
        F.sum(F.when(var == 1, v).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__sb"),
        F.sum(F.when(var == 0, v * v).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__qa"),
        F.sum(F.when(var == 1, v * v).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__qb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    nad, nbd = F.col("n_a").cast(d0), F.col("n_b").cast(d0)
    mean_a = F.col("__sa").cast("double") / na
    mean_b = F.col("__sb").cast("double") / nb
    num_a = (nad * F.col("__qa") - F.col("__sa") * F.col("__sa")).cast(d0)
    num_b = (nbd * F.col("__qb") - F.col("__sb") * F.col("__sb")).cast(d0)
    var_a = num_a.cast("double") / (na * (na - F.lit(1.0)))
    var_b = num_b.cast("double") / (nb * (nb - F.lit(1.0)))
    se2 = var_a / na + var_b / nb
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0)
    t = F.when(ok, (mean_b - mean_a) / F.sqrt(se2))
    dof = F.when(
        ok,
        (se2 * se2)
        / ((var_a / na) * (var_a / na) / (na - F.lit(1.0))
           + (var_b / nb) * (var_b / nb) / (nb - F.lit(1.0))),
    )
    return agg.select(
        "n_a", "n_b",
        F.when(F.col("n_a") > 0, mean_a).alias("mean_a"),
        F.when(F.col("n_b") > 0, mean_b).alias("mean_b"),
        F.when(F.col("n_a") > 1, var_a).alias("var_a"),
        F.when(F.col("n_b") > 1, var_b).alias("var_b"),
        t.alias("t_stat"), dof.alias("dof"),
    )


def cuped_adjustment(
    df: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the
    industry-standard pre-period adjustment: ``theta`` is the pooled OLS
    slope of post on pre (same exact DECIMAL sufficient statistics as
    ``grouped_ols``), each arm's adjusted mean is ``mean_y_arm - theta *
    (mean_x_arm - mean_x_pooled)``, and ``rho2`` — the squared
    pre/post correlation — IS the fraction of metric variance CUPED
    removes. One aggregation, pooled + per-arm conditional sums, every
    double derived from exact integer operands in one mirrored tree.

    Output (one row): ``n_a, n_b long; mean_a, mean_b, diff_mean, theta,
    rho2, mean_adj_a, mean_adj_b, diff_adj double`` (theta and the
    adjusted columns NULL when the pre-period is degenerate)."""
    d0 = "decimal(38,0)"
    var = F.col(variant_col)
    x, y = F.col(pre_col).cast(d0), F.col(post_col).cast(d0)
    agg = df.where(var.isin(0, 1)).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).cast(d0).alias("__sx"),
        F.sum(y).cast(d0).alias("__sy"),
        F.sum(x * x).cast(d0).alias("__sxx"),
        F.sum(y * y).cast(d0).alias("__syy"),
        F.sum(x * y).cast(d0).alias("__sxy"),
        F.sum(F.when(var == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(var == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(var == 0, x).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__sxa"),
        F.sum(F.when(var == 1, x).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__sxb"),
        F.sum(F.when(var == 0, y).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__sya"),
        F.sum(F.when(var == 1, y).otherwise(F.lit(0).cast(d0)))
        .cast(d0).alias("__syb"),
    )
    n = F.col("__n").cast(d0)
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(d0)
    den = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(d0)
    yden = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(d0)
    theta = num.cast("double") / den.cast("double")
    rho2 = (num.cast("double") / den.cast("double")) \
        * (num.cast("double") / yden.cast("double"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_x = F.col("__sx").cast("double") / F.col("__n").cast("double")
    mean_a = F.col("__sya").cast("double") / na
    mean_b = F.col("__syb").cast("double") / nb
    adj_a = mean_a - theta * (F.col("__sxa").cast("double") / na - mean_x)
    adj_b = mean_b - theta * (F.col("__sxb").cast("double") / nb - mean_x)
    ok = (den != 0) & (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        "n_a", "n_b",
        F.when(F.col("n_a") > 0, mean_a).alias("mean_a"),
        F.when(F.col("n_b") > 0, mean_b).alias("mean_b"),
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), mean_b - mean_a)
        .alias("diff_mean"),
        F.when(den != 0, theta).alias("theta"),
        F.when((den != 0) & (yden != 0), rho2).alias("rho2"),
        F.when(ok, adj_a).alias("mean_adj_a"),
        F.when(ok, adj_b).alias("mean_adj_b"),
        F.when(ok, adj_b - adj_a).alias("diff_adj"),
    )


def gini_exact(
    df: DataFrame,
    value_col: str,
    key_col: str,
    partitions: int | None = None,
    cache_owner: list | None = None,
) -> DataFrame:
    """Exact Gini coefficient of a value distribution —
    ``G = (2 * sum_i(rank_i * x_(i)) - (n + 1) * sum(x)) / (n * sum(x))``
    with values ranked ascending (key tie-break) — the standard
    inequality number for "how concentrated is activity / token mass /
    crawl volume", run over per-entity aggregates whose cardinality
    SCALES with the data (users, domains), so the global rank must not
    funnel through one window task.

    The rank is the pack_sequences two-pass distributed prefix:
    range-repartition on (value, key) pins one sampled layout (cached —
    re-evaluation would re-sample boundaries), row_number runs within
    each partition, one bounded collect (one row per partition) turns
    per-partition counts into exclusive base offsets, and a broadcast
    join re-bases the local ranks. No single-reducer sort anywhere.

    Sums accumulate in DECIMAL(38,0) (exact at any scale — rank*value
    reaches n*sum, past int64 on a large corpus), with BOTH operands
    cast to DECIMAL BEFORE the multiply: an int64 product would wrap
    silently in non-ANSI Spark once rank_i*x_i exceeds 2^63, and only
    then be cast. One conversion to DOUBLE for the single division.

    Same ``cache_owner`` contract as ``global_ranks``: the ranged
    layout is correctness-bearing (sampled boundaries) and stays
    pinned; pass a list and unpersist after consuming the one-row
    result, or accept LRU/session lifetime for run-once use.

    Output one row: ``n_entities (int64), total (int64), gini (double;
    NULL when the total is zero or n < 2)``."""
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    vals = df.select(
        F.col(key_col).alias("__k"),
        F.col(value_col).cast("long").alias("__x"),
    )
    ranged = (
        vals.repartitionByRange(partitions, F.col("__x"), F.col("__k"))
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    if cache_owner is not None:
        cache_owner.append(ranged)
    w = Window.partitionBy("__pid").orderBy(F.col("__x"), F.col("__k"))
    local = ranged.withColumn("__rn", F.row_number().over(w).cast("long"))
    counts = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("c")).collect()
    )
    base_rows, running = [], 0
    for pid, c in counts:
        base_rows.append((pid, running))
        running += c
    spark = df.sparkSession
    if base_rows:
        base = spark.createDataFrame(base_rows, "__pid int, __base long")
        ranked = local.join(F.broadcast(base), "__pid", "left").select(
            "__x",
            (F.col("__rn") + F.coalesce(F.col("__base"), F.lit(0)))
            .alias("__rank"),
        )
    else:
        ranked = local.select("__x", F.col("__rn").alias("__rank"))
    dec = "decimal(38,0)"
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum(F.col("__x").cast(dec)).cast(dec).alias("__sx"),
        F.sum(F.col("__rank").cast(dec) * F.col("__x").cast(dec)).cast(dec)
        .alias("__srx"),
    )
    num = (F.lit(2).cast(dec) * F.col("__srx")
           - (F.col("n_entities") + 1).cast(dec) * F.col("__sx"))
    den = F.col("n_entities").cast(dec) * F.col("__sx")
    return s.select(
        "n_entities",
        F.col("__sx").cast("long").alias("total"),
        F.when(
            (F.col("n_entities") >= 2) & (F.col("__sx") > 0),
            num.cast("double") / den.cast("double"),
        ).alias("gini"),
    )
