"""Deterministic hash sampling and dataset splits.

Training-data pipelines need sampling that is (a) reproducible across
runs, engines, and cluster sizes, (b) stable under data reordering and
repartitioning, and (c) consistent per entity — the same document always
lands in the same split, never straddling train and validation after a
re-run. ``df.sample``/``rand()`` give none of these (seeded RNG is
partition-layout dependent).

The primitive here is the engine's own hash kernel
(``functions.hashing.stable_hash``): a row is kept iff
``stable_hash(key || salt) % DENOM < rate * DENOM``. Pure codegen
(md5 + integer compare), no shuffle, trivially pushed past scans by
Catalyst, and identical in every engine that carries the frozen hash spec
(DuckDB oracle included). Different ``salt`` values give statistically
independent samples from the same keys — the standard trick for drawing
a fresh sample without touching previous ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.hashing import stable_hash

DENOM = 10_000  # rate resolution 0.01% — integer compare, no float edges


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, DENOM) for a key column."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(stable_hash(F.concat(c.cast("string"), F.lit(salt))), F.lit(DENOM))


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on
    ``key_col``. Same key -> same verdict, independent of partitioning."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(sample_bucket(key_col, salt) < int(rate * DENOM))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the RNG):
    stratum ``s`` keeps ``rates.get(s, default_rate)`` of its rows. The
    filter is a CASE over integer thresholds — one codegen predicate, no
    shuffle, prunable."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    threshold = F.lit(int(default_rate * DENOM))
    for s, r in rates.items():
        threshold = (
            F.when(F.col(strata_col) == F.lit(s), F.lit(int(r * DENOM)))
            .otherwise(threshold)
        )
    return df.where(sample_bucket(key_col, salt) < threshold)


def split_column(
    key: Column | str,
    fractions: dict[str, float],
    salt: str = "_split",
) -> Column:
    """Assign each key to exactly one named split (e.g. train/val/test).
    ``fractions`` must sum to 1; split names are assigned over contiguous
    bucket ranges in sorted-name-insensitive insertion order, so adding a
    split at the end never reshuffles earlier assignments."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = sample_bucket(key, salt)
    expr = None
    hi = 0
    names = list(fractions)
    for name in names[:-1]:
        hi += int(fractions[name] * DENOM)
        expr = (
            F.when(bucket < hi, F.lit(name))
            if expr is None
            else expr.when(bucket < hi, F.lit(name))
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "_split",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split column (default 80/10/10)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(split_col, split_column(key_col, fractions, salt))


def balanced_sample(
    df: DataFrame, class_col: str, k: int, key_col: str, salt: str = "_bal"
) -> DataFrame:
    """Class-balanced downsampling: at most ``k`` rows per class, chosen
    by deterministic hash rank (NOT arbitrary take-k, which depends on
    partition layout). The standard fix for skewed class mixes before
    training — a dominant class is capped while rare classes keep all
    their rows.

    Delegates to ``per_group_cap``: the selection order ``(hash_bucket,
    key)`` is identical, and the two-phase bucket-threshold plan ranks
    only ~1/DENOM of a hot class through a window instead of funneling
    the whole class into one window task (which this operator did
    before round 6 — the naive shape survives only in the equivalence
    test that pins the delegation)."""
    return per_group_cap(df, class_col, k, key_col, salt)


def weighted_sample_topk(
    df: DataFrame, weight_col: str, k: int, key_col: str, salt: str = "_w"
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows, inclusion probability
    approximately proportional to ``weight_col``: rank each row by
    ``(bucket + 1) / weight`` (heavier rows draw systematically smaller
    ranks) and keep the global ``k`` smallest — the hash-deterministic
    first-order form of Efraimidis-Spirakis A-Res, chosen over the exact
    ``u^(1/w)`` key because division of identical doubles is bit-stable
    across engines while ``pow``/``ln`` are not. The ``+1`` keeps a
    zero bucket from erasing the weight.

    Plans as TakeOrderedAndProject — no global sort materializes; weights
    must be strictly positive."""
    if k < 1:
        raise ValueError("k must be >= 1")
    rank = (
        (sample_bucket(key_col, salt) + F.lit(1)).cast("double")
        / F.col(weight_col).cast("double")
    )
    return (
        df.where(F.col(weight_col) > 0)
        .orderBy(rank.asc(), F.col(key_col).asc())
        .limit(k)
    )


def remix_equal(
    df: DataFrame, group_col: str, key_col: str, salt: str = "_remix"
) -> DataFrame:
    """Re-mix to a uniform group distribution by undersampling every group
    to the size of the SMALLEST group — the deterministic "equal mixture"
    step of corpus construction (e.g. balance languages before training).
    Exact counts (not rate-approximate): per-group hash-rank top-n with a
    unique-key tie-break, where n is the min group size from one bounded
    aggregate (``n_groups`` rows, broadcast back as a literal).

    One count aggregation to find ``min_count``, then the skew-safe
    ``per_group_cap`` selection (identical (hash_bucket, key) order, but
    a hot group ranks only its threshold-bucket slice through a window
    instead of its whole membership); the output is exactly
    ``n_groups * min_count`` rows on every engine."""
    counts = df.groupBy(group_col).count().collect()  # bounded: one row/group
    if not counts:
        return df
    min_n = min(r["count"] for r in counts)
    return per_group_cap(df, group_col, min_n, key_col, salt)


def remix_equal_tokens(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_col: str,
    per_group_budget: int,
    salt: str = "_tokmix",
) -> DataFrame:
    """Equal-WEIGHT remix: cap every group at the same cumulative weight
    (e.g. the same number of training tokens per language) rather than the
    same row count — document lengths differ across groups, so equal doc
    counts are not equal token mass. Rows are admitted in deterministic
    hash order (unique-key tie-break) until the group's running weight
    would exceed ``per_group_budget``; the cut is a strict prefix of that
    order, exact and layout-invariant.

    Output: input columns plus ``cum_weight`` (the group-local running
    total including the row).

    Scale shape: one shuffle on ``group_col`` for the partitioned window —
    groups are processed independently across executors, no global order,
    no driver collect. Integer accumulation only."""
    from pyspark.sql import Window

    if per_group_budget < 0:
        raise ValueError(
            f"per_group_budget must be >= 0, got {per_group_budget}"
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy(sample_bucket(key_col, salt), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "cum_weight", F.sum(F.col(weight_col).cast("long")).over(w)
        )
        .where(F.col("cum_weight") <= F.lit(int(per_group_budget)))
    )


def remix_temperature(
    df: DataFrame,
    group_col: str,
    key_col: str,
    total_out: int,
    salt: str = "_temp",
) -> DataFrame:
    """Temperature-based mixture resampling at T=2 (sampling probability
    proportional to sqrt of the group's share) — the standard multilingual
    corpus-mix step that upweights low-resource groups relative to their
    raw share without going all the way to the uniform mix of
    ``remix_equal``.

    Exact and cross-engine deterministic: per-group weight is
    ``floor(sqrt(n_i))`` — IEEE-754 ``sqrt`` is correctly rounded, so both
    engines agree bit-for-bit — and the per-group quota is pure integer
    arithmetic ``min(n_i, (total_out * w_i) div sum_w)``. No float sums
    whose order could differ between engines. The realized output is
    slightly under ``total_out`` (floor rounding), never over.

    Scale shape: one count aggregation (``n_groups`` rows), the quota
    table broadcast back, one window shuffle on ``group_col`` for the
    hash-rank selection with a unique-key tie-break. No driver collect."""
    from pyspark.sql import Window

    if total_out < 0:
        raise ValueError(f"total_out must be >= 0, got {total_out}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    wts = counts.withColumn(
        "__wt", F.floor(F.sqrt(F.col("__n").cast("double"))).cast("long")
    )
    tot = wts.agg(F.sum("__wt").alias("__tot"))
    quota = (
        wts.crossJoin(F.broadcast(tot))
        .withColumn(
            "__target",
            F.least(
                F.col("__n"),
                F.expr(f"(CAST({int(total_out)} AS BIGINT) * __wt) div __tot"),
            ),
        )
        .select(group_col, "__target")
    )
    w = Window.partitionBy(group_col).orderBy(
        sample_bucket(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .join(F.broadcast(quota), group_col)
        .where(F.col("__rk") <= F.col("__target"))
        .select(*df.columns)
    )


def per_group_cap(
    df: DataFrame, group_col: str, k: int, key_col: str, salt: str = "_cap"
) -> DataFrame:
    """Deterministic per-group quota: keep at most ``k`` rows per group,
    chosen by hash order — the per-domain document cap every web-corpus
    pipeline applies so hub domains can't dominate the training mix.
    Selection order is ``(sample_bucket(key, salt), key)``, so the kept
    set is reproducible across runs, engines, and partitionings, and a
    fresh ``salt`` draws an independent quota.

    Scale shape (the reason this is NOT one ``row_number() OVER
    (PARTITION BY group)``): a hub group would funnel its entire
    membership through a single window task. Instead, phase A computes
    per-(group, bucket) counts (combinable aggregation; at most
    ``DENOM`` rows per group) and finds each group's threshold bucket
    ``t`` where the cumulative count reaches ``k`` — the windows here
    run over the COUNTS frame, not the data. Phase B keeps every row
    below ``t`` with a plain filter and ranks only the rows AT ``t``
    (~1/DENOM of the group) through a window. Equivalent by
    construction to the single-window form, at ~DENOM-times-smaller
    worst-case window population.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    data = df.withColumn("__bucket", sample_bucket(key_col, salt))
    counts = data.groupBy(group_col, "__bucket").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wcum = Window.partitionBy(group_col).orderBy("__bucket")
    cum = counts.withColumn("__cum", F.sum("__n").over(wcum))
    # Threshold bucket per group (absent when the group is under quota),
    # and how many rows the quota still allows from that bucket.
    att = (
        cum.where(F.col("__cum") >= k)
        .withColumn(
            "__rnk",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy("__bucket")
            ),
        )
        .where(F.col("__rnk") == 1)
        .select(
            group_col,
            F.col("__bucket").alias("__t"),
            (F.lit(k) - (F.col("__cum") - F.col("__n"))).alias("__need"),
        )
    )
    joined = data.join(att, [group_col], "left")
    below = joined.where(
        F.col("__t").isNull() | (F.col("__bucket") < F.col("__t"))
    )
    at_thr = (
        joined.where(F.col("__bucket") == F.col("__t"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy(F.col(key_col))
            ),
        )
        .where(F.col("__rn") <= F.col("__need"))
    )
    cols = df.columns
    return below.select(*cols).unionByName(at_thr.select(*cols))


def grouped_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "_gsplit",
) -> DataFrame:
    """Leakage-safe dataset split: the split key is the GROUP (domain /
    source / author), not the row — every document of a group lands in
    the same split, so intra-group near-duplicates can never straddle
    train and test. Row-keyed splits leak by construction on web
    corpora, where near-dups cluster within a domain; this is the
    standard contamination guard. Same determinism contract as
    ``split_column`` (pure hash, partitioning-invariant), zero shuffle:
    the assignment is a map-side expression on the group value."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(
        "split", split_column(F.col(group_col), fractions, salt)
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 4,
    epoch: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic training-epoch shuffle + equal sharding: every row
    gets a reproducible global position under the ``(hash(id || epoch
    salt), id)`` total order and a contiguous shard assignment
    ``shard = epoch_pos * n_shards div n`` (shard sizes differ by at
    most one). A new ``epoch`` value re-keys the hash, giving an
    independent full permutation per epoch — the standard way a data
    loader gets per-epoch ordering that is identical on every re-run
    and every cluster layout, unlike ``rand()`` seeds (partition-layout
    dependent) or ``ORDER BY rand()`` (a single-reducer global sort).

    Positions come from ``stats.global_ranks`` — the two-pass
    distributed prefix-sum rank (range partition on the uniform hash
    key, per-partition windows, one count-per-partition collect) — so
    no reducer ever sees a corpus-sized window partition.

    Output: ``<id_col>, epoch_pos (int64, 0-based), shard (int64)``.
    """
    from .stats import global_ranks

    keyed = df.select(
        F.col(id_col),
        stable_hash(
            F.concat(F.col(id_col).cast("string"), F.lit(f"__epoch{epoch}|"))
        ).alias("__key"),
    )
    ranked, n = global_ranks(keyed, "__key", id_col, partitions=partitions)
    return ranked.select(
        F.col(id_col),
        F.col("__rank").cast("long").alias("epoch_pos"),
        # integer `div`, never `/` (the events-timestamp lesson)
        F.expr(f"__rank * {n_shards} div {max(n, 1)}")
        .cast("long").alias("shard"),
    )


def water_fill_budget(
    counts: DataFrame,
    budget: int,
    group_col: str = "source",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Water-filling token-budget allocation across domains: spend a
    total token budget ``B`` so that every domain is capped at a common
    waterline ``W`` — small domains keep everything, large ones are cut
    to ``W`` — the max-min-fair corpus mix (the continuous limit of the
    per-domain-cap heuristic, and the allocation DoReMi-style mixers
    start from).

    Exact integer closed form, no iteration: sort domains ascending by
    count, exclusive prefix sum ``P``, candidate waterline at row k is
    ``(B - P) div (m - k + 1)``; the first row whose candidate falls
    below its own count is the breakpoint and its candidate IS ``W``
    (every earlier domain fits under the line whole; every later one is
    cut to ``W``). No breakpoint means the budget covers the corpus and
    every domain is fully granted. Guarantees
    ``sum(granted) <= B < sum(min(count, W + 1))`` when cutting.

    Windows here range over the DOMAIN table (group-cardinality-bounded,
    the sketch register-table shape), never the corpus: at 100 TB the
    corpus contributes one count aggregation; everything after is
    arithmetic on ``m`` rows. Output: ``<group_col>, <count_col>,
    waterline (int64, NULL when unconstrained), granted (int64)``.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    m = Window.orderBy(F.col(count_col).asc(), F.col(group_col).asc())
    full = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        counts.select(group_col, F.col(count_col).cast("long")
                      .alias(count_col))
        .withColumn("__k", F.row_number().over(m).cast("long"))
        .withColumn("__p", F.coalesce(
            F.sum(count_col).over(
                m.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).cast("long"))
        .withColumn("__m", F.count(F.lit(1)).over(full).cast("long"))
    )
    cand = F.expr(f"({budget} - __p) div (__m - __k + 1)")
    flagged = ranked.withColumn("__cand", cand).withColumn(
        "__hit", F.when(F.col("__cand") < F.col(count_col),
                        F.struct("__k", "__cand")))
    line = F.min("__hit").over(full)["__cand"]
    out = flagged.withColumn("waterline", line).select(
        group_col,
        count_col,
        F.col("waterline").cast("long"),
        F.when(F.col("waterline").isNotNull(),
               F.least(F.col(count_col), F.col("waterline")))
        .otherwise(F.col(count_col)).cast("long").alias("granted"),
    )
    return out


def sample_fixed_k(
    df: DataFrame, k: int, key_col: str, salt: str = "_fixk"
) -> DataFrame:
    """Deterministic EXACT-k uniform sample — the missing cell next to
    ``hash_sample`` (rate-based, size varies with the input) and
    ``weighted_sample_topk`` (PPS): take the k rows whose salted hash
    bucket ranks smallest, key as the tie-break. Reproducible across
    runs/engines/partitionings like every sampler here, and plans as
    TakeOrderedAndProject — no global sort, no shuffle of the corpus,
    each task keeps its local top-k and the driver merges k-sized
    heaps. Different salts draw statistically independent samples."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return df.orderBy(
        sample_bucket(key_col, salt).asc(), F.col(key_col).asc()
    ).limit(k)
