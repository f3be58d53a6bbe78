"""Distributed Bloom filter — the fixed-size membership summary that turns
semi-join screens (contamination, URL blocklists, seen-before checks) into
a broadcast + map-only probe.

The filter is ``num_bits`` of state stored as ``num_bits/64`` longs, one
row per 64-bit word: each key sets ``num_hashes`` bits chosen by salted
rows of the engine's frozen MD5 kernel, the build aggregates per-word
``bit_or`` masks (combinable — mapper output is bounded by the word count,
never by key cardinality, exactly like ``operators/sketch.py``), and a
probe key "might be present" iff ALL its bits are set. False positives
only, never false negatives, at the textbook rate
``(1 - e^(-k*n/m))^k``.

Why this beats the exact distinct-gram semi-join at 100 TB: the training
side of ``contamination.contamination_report`` reduces to one row per
DISTINCT n-gram — billions of rows that must shuffle to meet the probe
side. The Bloom build reduces the same corpus to at most ``num_bits/64``
rows (a 1-Gbit filter is 16M longs ≈ 128 MB) which BROADCASTS, so the
probe side never shuffles at all. The trade is a deterministic,
per-gram-reproducible false-positive rate — contamination flags can only
over-fire, the safe direction for eval hygiene.

Determinism: bucket choice is the frozen hash kernel salted per hash row,
so the DuckDB oracle rebuilds bit-identical words and the whole family is
oracle-gated (no randomness anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.textops import salted_hash

BLOOM_SALT = "__bloom"


def _check(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")


def _bucket(c: Column, row: int, num_bits: int, salt: str) -> Column:
    return salted_hash(c, f"{salt}{row}|") % num_bits


def _word_mask(c: Column, row: int, num_bits: int, salt: str) -> Column:
    b = _bucket(c, row, num_bits, salt)
    # F.shiftleft only takes a literal shift amount; the SQL function
    # accepts a column, reached via call_function.
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (b % 64).cast("int")
    )
    return F.struct(
        (b / 64).cast("int").alias("word_idx"), mask.alias("mask")
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    salt: str = BLOOM_SALT,
) -> DataFrame:
    """Aggregate the filter: ``word_idx int, word long`` — one row per
    64-bit word with at least one bit set. Null/empty keys are dropped
    (same rationale as ``cms_sketch``)."""
    _check(num_bits, num_hashes)
    key = F.col(key_col)
    wm = F.array(*[_word_mask(key, r, num_bits, salt) for r in range(num_hashes)])
    return (
        df.where(key.isNotNull() & (key != F.lit("")))
        .select(F.explode(wm).alias("__wm"))
        .select("__wm.word_idx", "__wm.mask")
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    salt: str = BLOOM_SALT,
) -> DataFrame:
    """Probe: adds ``might_contain`` to ``probes`` (distinct rows are NOT
    assumed — each row is answered independently: a unique row id is
    carried through the explode so duplicate probe rows neither collapse
    nor cross-contaminate the bit count). The filter side is explicitly
    broadcast: the probe relation never shuffles; per probe row the plan
    costs ``num_hashes`` exploded rows + one broadcast-hash-join lookup
    each. Membership is ``min(hit) == 1`` (every bit set), which stays
    correct even if the grouping key is not unique."""
    _check(num_bits, num_hashes)
    key = F.col(key_col)
    cols = probes.columns
    wm = F.array(*[_word_mask(key, r, num_bits, salt) for r in range(num_hashes)])
    exploded = probes.select(
        *cols,
        F.monotonically_increasing_id().alias("__row_id"),
    ).select(*cols, "__row_id", F.posexplode(wm).alias("__r", "__wm"))
    looked = exploded.join(F.broadcast(bloom),
                           exploded["__wm.word_idx"] == bloom["word_idx"],
                           "left")
    hit = (
        F.coalesce(F.col("word"), F.lit(0))
        .bitwiseAND(F.col("__wm.mask")) != 0
    ).cast("int")
    return (
        looked.groupBy("__row_id", *cols)
        .agg((F.min(hit) == 1).alias("might_contain"))
        .drop("__row_id")
    )


def bloom_contamination_report(
    train: DataFrame,
    test: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_threshold_pct: int = 20,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    salt: str = BLOOM_SALT,
) -> DataFrame:
    """``contamination.contamination_report`` with the training gram set
    compressed to a Bloom filter: same output shape
    (``id, n_grams, n_contaminated, contamination_ratio, flagged``), hit
    counts may only OVER-count (false positives), and the flag comparison
    stays exact-integer. The train side aggregates to ≤ ``num_bits/64``
    broadcastable rows; the test side is map-side + one broadcast join."""
    from .contamination import token_ngrams
    from .dedup import ensure_parallelism

    grams = token_ngrams(F.col(text_col), n)
    train = ensure_parallelism(train)
    test = ensure_parallelism(test)
    train_grams = train.select(F.explode(grams).alias("gram"))
    bloom = bloom_build(train_grams, "gram", num_bits, num_hashes, salt)

    test_grams = test.select(F.col(id_col), F.explode(grams).alias("gram"))
    probed = bloom_might_contain(
        bloom, test_grams, "gram", num_bits, num_hashes, salt
    )
    hits = (
        probed.groupBy(id_col)
        .agg(F.sum(F.col("might_contain").cast("long")).alias("n_contaminated"))
    )
    totals = test.select(
        F.col(id_col), F.size(grams).cast("long").alias("n_grams")
    )
    joined = totals.join(hits, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
        .alias("n_contaminated"),
    )
    return joined.select(
        id_col,
        "n_grams",
        "n_contaminated",
        F.when(
            F.col("n_grams") > 0,
            F.col("n_contaminated").cast("double")
            / F.col("n_grams").cast("double"),
        ).alias("contamination_ratio"),
        (
            (F.col("n_grams") > 0)
            & (100 * F.col("n_contaminated")
               >= flag_threshold_pct * F.col("n_grams"))
        ).alias("flagged"),
    )
