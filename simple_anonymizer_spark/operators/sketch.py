"""Count-min sketch over a key column — the bounded-memory frequency
summary SCALE.md promises for heavy-hitter work when the exact
`groupBy(key).count()` state (one cell per DISTINCT key) stops fitting.

The sketch is a ``depth x width`` grid of counters; each key increments
one counter per row, chosen by a per-row salted hash. Estimates read the
MINIMUM of a key's ``depth`` counters: always an over-estimate (hash
collisions only ever add), with the classic (eps, delta) bound —
``width = e/eps`` and ``depth = ln(1/delta)`` give
``P[est - true > eps * N] < delta``.

Why this shape at 100 TB: the exact count's shuffle carries one record
per distinct key (billions for web-scale token streams); the sketch
shuffle carries at most ``depth x width`` cells REGARDLESS of key
cardinality — partial aggregation compresses every mapper's output to
the grid size, and the reduce side is a fixed-size table that never
skews. The trade is the probe step: estimates need a candidate set
(sketches cannot enumerate keys), which is why ``cms_topk`` takes an
explicit probe frame.

Hashing is the engine's frozen MD5 kernel (``functions/hashing.py``)
salted per sketch row, so the DuckDB oracle replays the exact grid —
the sketch is deterministic, not sampled, and fully oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.textops import salted_hash

CMS_SALT = "__cms"


def _bucket(c: Column, row: int, width: int, salt: str) -> Column:
    """Sketch-row ``row``'s bucket for value ``c``: salted stable hash mod
    width. Salt layout ``<salt><row>|`` keeps rows independent."""
    return (salted_hash(c, f"{salt}{row}|") % width).cast("int")


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = CMS_SALT,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one output row per non-empty cell.
    Output: ``sketch_row int, bucket int, cnt long`` (weighted when
    ``weight_col`` is given). Null/empty keys are dropped (they carry no
    frequency information and the hash kernel reserves 0 for them)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    key = F.col(key_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    buckets = F.array(*[_bucket(key, r, width, salt) for r in range(depth)])
    return (
        df.where(key.isNotNull() & (key != F.lit("")))
        .select(F.posexplode(buckets).alias("sketch_row", "bucket"), w.alias("__w"))
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Point-estimate each probe key's frequency: min over its ``depth``
    cells. Probe keys absent from every cell estimate 0 (possible only
    when some sketch row has an empty bucket for the key — rare, still an
    over-estimate). Output: ``<key_col>, est long``.

    Plan: the probe side explodes to ``depth`` rows and equi-joins the
    sketch on ``(sketch_row, bucket)`` — when probes are a small candidate
    set (the normal case) the exploded side broadcasts and the sketch
    never shuffles."""
    key = F.col(key_col)
    buckets = F.array(*[_bucket(key, r, width, salt) for r in range(depth)])
    exploded = probes.select(
        key, F.posexplode(buckets).alias("sketch_row", "bucket")
    )
    return (
        exploded.join(sketch, ["sketch_row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def cms_topk(
    df: DataFrame,
    probes: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    salt: str = CMS_SALT,
    weight_col: str | None = None,
) -> DataFrame:
    """Heavy hitters among ``probes`` by sketch estimate: build the sketch
    over ``df`` and rank probe keys by estimated frequency (key tie-break
    for cross-engine determinism). Output: ``<key_col>, est`` — top ``k``."""
    sketch = cms_sketch(df, key_col, depth, width, salt, weight_col)
    est = cms_estimate(sketch, probes, key_col, depth, width, salt)
    return est.orderBy(F.col("est").desc(), F.col(key_col)).limit(k)
