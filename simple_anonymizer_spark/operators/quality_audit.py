"""Data-quality audit: the pre-flight expectations a pipeline runs before
trusting a snapshot — null rates, key uniqueness, referential integrity,
domain bounds — emitted as one long-format (metric, value) report.

Every metric is a combinable aggregation or an anti-join count, so the
report costs a constant number of scans regardless of table size; at
100 TB each check is exactly the aggregation/semi-join shape the rest of
the engine already optimizes (counts partial-aggregate; the orphan check
is a broadcast/shuffle anti-join on the FK).

Determinism: all metrics are exact BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _metric(name: str, value: Column) -> Column:
    return F.struct(F.lit(name).alias("metric"), value.cast("long").alias("value"))


def audit_orders(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Audit the orders snapshot against its customer dimension.

    Metrics: row count, per-column null counts, primary-key duplicate
    rows (rows beyond the first per o_orderkey), FK orphans (orders whose
    customer is missing), and domain violations (non-positive totals).
    """
    base = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("null_orderdate"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias("null_totalprice"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpositive_total"),
    )
    orphans = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    wide = base.crossJoin(F.broadcast(orphans))
    metrics = [
        "n_rows", "null_custkey", "null_orderdate", "null_totalprice",
        "dup_pk_rows", "nonpositive_total", "fk_orphans",
    ]
    return (
        wide.select(
            F.explode(F.array(*[_metric(m, F.col(m)) for m in metrics]))
            .alias("kv")
        )
        .select(F.col("kv.metric").alias("metric"), F.col("kv.value").alias("value"))
    )


def anomaly_flags(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    n_sigma: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates more than ``n_sigma`` sample standard
    deviations from their group mean — the z-score outlier screen, built
    on stats.moments (exact DECIMAL sums -> IEEE double combine) joined
    back to the rows. Comparison is ``(x - mean)^2 > n²·var`` on
    identical doubles — no sqrt, engine-identical.

    Output: id, group cols, value (as double), group mean, the squared
    deviation, all deterministic.
    """
    from .stats import moments

    m = moments(df, group_cols, value_col)
    v = F.col(value_col).cast("decimal(12,2)").cast("double")
    joined = df.join(F.broadcast(m), group_cols)
    dev2 = (v - F.col("mean_v")) * (v - F.col("mean_v"))
    var = F.col("stddev_v") * F.col("stddev_v")
    return (
        joined.where(
            F.col("stddev_v").isNotNull()
            & (dev2 > F.lit(n_sigma * n_sigma) * var)
        )
        .select(
            F.col(id_col),
            *group_cols,
            v.alias("value"),
            F.col("mean_v"),
            dev2.alias("dev_sq"),
        )
    )


def profile_table(df: DataFrame) -> DataFrame:
    """Generic per-column profile: (column, null_count, n_distinct) —
    the data-catalog summary, computed in ONE aggregation pass however
    many columns the table has (the driver loop builds expressions, not
    jobs). Distinct counts ignore nulls (SQL COUNT(DISTINCT) semantics).
    Exact integers only — type-neutral and engine-neutral by design;
    min/max stay out because float/date formatting is not cross-engine
    stable in string form.
    """
    aggs = []
    for field in df.schema.fields:
        c = field.name
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__null__{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"__nd__{c}"))
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(field.name).alias("column"),
            F.col(f"__null__{field.name}").alias("null_count"),
            F.col(f"__nd__{field.name}").alias("n_distinct"),
        )
        for field in df.schema.fields
    ]
    return wide.select(F.explode(F.array(*entries)).alias("kv")).select(
        F.col("kv.column").alias("column"),
        F.col("kv.null_count").alias("null_count"),
        F.col("kv.n_distinct").alias("n_distinct"),
    )


def fk_audit(tables: dict[str, DataFrame], foreign_keys) -> DataFrame:
    """Schema-wide referential integrity: one row per FK edge with the
    orphan count (child rows whose FK is fully non-null but matches no
    parent). Each edge is one anti-join count; the union stays lazy so
    Spark runs the whole audit as one job graph.
    """
    out = None
    for fk in foreign_keys:
        child = tables[fk.fk_table]
        parent = tables[fk.pk_table]
        child_cols = [c for c, _ in fk.columns]
        cond = None
        for (cc, pc) in fk.columns:
            term = child[cc] == parent[pc]
            cond = term if cond is None else cond & term
        non_null = None
        for cc in child_cols:
            term = child[cc].isNotNull()
            non_null = term if non_null is None else non_null & term
        orphans = (
            child.where(non_null)
            .join(parent, cond, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("orphans"))
            .select(
                F.lit(fk.fk_table).alias("child_table"),
                F.lit(fk.pk_table).alias("parent_table"),
                F.lit(",".join(child_cols)).alias("fk_columns"),
                "orphans",
            )
        )
        out = orphans if out is None else out.unionByName(orphans)
    return out


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive table checksum for migration validation: one
    row with ``n_rows`` and ``checksum`` — the sum of the engine's
    stable hash over a canonical per-row serialization
    (``coalesce(cast(col, string), NUL-sentinel)`` joined with ``|``),
    accumulated in DECIMAL(38) and reduced mod 2^61 so the value is
    identical at any row count without overflow. Combinable aggregation:
    a 100 TB table checksums in one map-side-combined pass with no
    shuffle beyond the single-row merge.

    Use it to certify copies and rewrites — ``compact_parquet``,
    Parquet<->ORC conversion, MERGE swaps: equal (n_rows, checksum)
    before and after means equal content with probability 1 - ~2^-61
    per differing table. Float columns are the caller's risk: double ->
    string rendering can differ across engines, so cross-ENGINE
    comparisons should pass integer/string/date ``cols`` explicitly
    (same-engine before/after comparisons can hash everything)."""
    from ..functions.hashing import stable_hash

    cols = cols or df.columns
    canon = F.concat_ws("|", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ])
    h = stable_hash(canon).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.pmod(F.coalesce(F.sum(h), F.lit(0).cast("decimal(38,0)")),
               F.lit(2 ** 61).cast("decimal(38,0)"))
        .cast("long").alias("checksum"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Version delta between two corpus snapshots — the audit a dataset
    release pipeline runs before publishing v(N+1): which documents were
    added, removed, or content-changed since vN. Content identity is the
    engine's stable hash of the text, so renames of physical files /
    re-partitioning never show up as changes.

    Output: one row per NON-identical document — ``<id_col>, status
    ('added' | 'removed' | 'changed'), old_hash, new_hash`` (hashes
    NULL on the side the document is missing from). Unchanged documents
    produce no row, so the output is delta-sized, not corpus-sized.

    Scale (100 TB): two map-only hash projections and ONE full outer
    join on the id — no text ever shuffles (only id + 8-byte hash), and
    the join key is the natural primary key, so bucketed snapshots
    co-locate it shuffle-free.
    """
    from ..functions.hashing import stable_hash

    o = old.select(F.col(id_col), stable_hash(F.col(text_col)).alias("__oh"))
    n = new.select(F.col(id_col), stable_hash(F.col(text_col)).alias("__nh"))
    joined = o.join(n, id_col, "full_outer").where(
        F.col("__oh").isNull() | F.col("__nh").isNull()
        | (F.col("__oh") != F.col("__nh"))
    )
    return joined.select(
        id_col,
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed")).alias("status"),
        F.col("__oh").alias("old_hash"),
        F.col("__nh").alias("new_hash"),
    )


def release_manifest(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row release certificate for a corpus version bump: row counts
    of both snapshots, the added/removed/changed/unchanged breakdown
    from ``corpus_diff``, and the order-insensitive ``table_checksum``
    of each side over ``(id, text)`` — everything an audit trail needs
    to sign off v(N+1) against vN, in one combinable pass per input
    plus the delta-sized diff aggregation.

    Output columns: ``n_old, n_new, n_added, n_removed, n_changed,
    n_unchanged, old_checksum, new_checksum`` (all int64).
    """
    diff = corpus_diff(old, new, id_col, text_col)
    breakdown = diff.agg(
        F.coalesce(F.sum((F.col("status") == "added").cast("long")),
                   F.lit(0)).cast("long").alias("n_added"),
        F.coalesce(F.sum((F.col("status") == "removed").cast("long")),
                   F.lit(0)).cast("long").alias("n_removed"),
        F.coalesce(F.sum((F.col("status") == "changed").cast("long")),
                   F.lit(0)).cast("long").alias("n_changed"),
    )
    oc = table_checksum(old.select(id_col, text_col)).select(
        F.col("n_rows").alias("n_old"),
        F.col("checksum").alias("old_checksum"),
    )
    nc = table_checksum(new.select(id_col, text_col)).select(
        F.col("n_rows").alias("n_new"),
        F.col("checksum").alias("new_checksum"),
    )
    return (
        oc.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(breakdown))
        .select(
            "n_old", "n_new", "n_added", "n_removed", "n_changed",
            (F.col("n_old") - F.col("n_removed") - F.col("n_changed"))
            .cast("long").alias("n_unchanged"),
            "old_checksum", "new_checksum",
        )
    )
