"""The engine's declared query set — one entry per operator capability.

Each function takes ``(spark, sf_dir)`` and returns a DataFrame; the
driver harness compares every query against its DuckDB oracle
(``oracle/queries.py``) by row count, schema, and order-insensitive
value hash. Column names are aliased identically on both sides.

Float determinism policy (engine-wide): double aggregates go through
exact DECIMAL accumulation and come back as DOUBLE (`_dec`); divisions
happen on already-identical doubles; ranked outputs always carry a
unique-key tie-break. Timestamps are emitted as epoch microseconds
(bigint) to avoid cross-engine timestamp encoding drift.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import anonymizers as A
from .functions import lens as lens_mod
from .functions import textops as T
from .operators import dedup, similarity, text_analysis
from .plans import TableSpec, apply_spec
from .plans.propagation import apply_subsetting
from .sources.catalog import Catalog, LogicalFK
from .sources.parquet import read_sf_table
from .streaming import events as streaming_events

QueryFn = Callable[[SparkSession, str], DataFrame]  # (spark, sf_dir) -> df
QUERIES: dict[str, QueryFn] = {}


def query(name: str):
    def register(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        return fn

    return register


def _dec(c: Column, precision: int = 12, scale: int = 2) -> Column:
    return c.cast(f"decimal({precision},{scale})")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_sf_table(spark, sf_dir, name)


def _tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read with the small-input parallelism guard — for queries whose cost
    is per-row hashing rather than I/O (MD5 projections serialize onto 1-3
    row-group splits otherwise)."""
    from .operators.dedup import ensure_parallelism

    return ensure_parallelism(read_sf_table(spark, sf_dir, name))


def _scratch(prefix: str) -> str:
    """A per-process temp dir for the table-writing queries, removed at
    interpreter exit — every driver/bench/oracle run used to leak one
    table copy per invocation into /tmp (round-11 advice)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d


# ---------------------------------------------------------------------------
# Anonymizers (SURVEY §2.8)
# ---------------------------------------------------------------------------


@query("anon_stable_hash")
def anon_stable_hash(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select(
        "c_custkey", A.stable_hash("c_name").alias("name_hash")
    )


@query("anon_customer_pii")
def anon_customer_pii(spark, sf_dir):
    c = _tp(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        A.full_name("c_name").alias("anon_name"),
        A.email("c_name").alias("anon_email"),
        A.phone_number("c_name").alias("anon_phone"),
        A.street_address("c_name").alias("anon_street"),
        A.city("c_name").alias("anon_city"),
        A.zip_code("c_name").alias("anon_zip"),
    )


@query("anon_names")
def anon_names(spark, sf_dir):
    s = _tp(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        A.first_name("s_name").alias("anon_first"),
        A.last_name("s_name").alias("anon_last"),
        A.male_first_name("s_name").alias("anon_male"),
        A.female_first_name("s_name").alias("anon_female"),
        A.state("s_name").alias("anon_state"),
        A.state_abbr("s_name").alias("anon_state_abbr"),
        A.country("s_name").alias("anon_country"),
    )


@query("anon_redact")
def anon_redact(spark, sf_dir):
    p = _tp(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        A.redact("p_type").alias("redacted_type"),
        A.partial_redact("p_name", 3, 2).alias("partial_name"),
        A.lorem_text("p_name").alias("lorem_name"),
    )


@query("anon_account_numbers")
def anon_account_numbers(spark, sf_dir):
    """Luhn-valid synthetic account numbers
    (anonymizers.account_number): 11 hash-derived payload digits plus
    the computed mod-10 check digit — anonymized values still pass
    format validators downstream."""
    c = _tp(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", A.account_number("c_name").alias("acct")
    )


@query("pipeline_release_orders")
def pipeline_release_orders(spark, sf_dir):
    """Composite anonymized release — the reference's whole workflow in
    one plan: subset customers to one region through the FK dimension
    chain, anonymize their PII with the native expressions, date-shift
    their orders per entity, and emit the joined release table."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    o = _t(spark, sf_dir, "orders")
    released = c.join(o, c.c_custkey == o.o_custkey)
    return released.select(
        "c_custkey",
        A.full_name("c_name").alias("anon_name"),
        A.email("c_name").alias("anon_email"),
        A.city("c_name").alias("anon_city"),
        "o_orderkey",
        A.shift_timestamp("o_orderdate", "c_custkey", max_days=180)
        .alias("shifted_us"),
        _dec(F.col("o_totalprice")).cast("double").alias("total_price"),
    )


@query("anon_ip_prefix")
def anon_ip_prefix(spark, sf_dir):
    """Crypto-PAn-style prefix-preserving IP anonymization
    (anonymizers.prefix_preserving_ip): synthetic per-customer IPv4s
    anonymized so shared subnets stay shared, addresses unlink."""
    from .functions.hashing import _raw_hash

    c = _tp(spark, sf_dir, "customer")
    ip = F.pmod(_raw_hash(F.col("c_custkey").cast("string")),
                F.lit(1 << 32)).cast("long")
    synth = c.select("c_custkey", ip.alias("ip"))
    return synth.select(
        "c_custkey",
        "ip",
        A.prefix_preserving_ip("ip").alias("ip_anon"),
    )


@query("anon_shift_dates")
def anon_shift_dates(spark, sf_dir):
    """Consistent per-customer date shifting (anonymizers.shift_timestamp):
    all of a customer's order dates move by one stable whole-day offset,
    preserving intra-customer intervals while unlinking absolute dates."""
    o = _tp(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        A.shift_timestamp("o_orderdate", "o_custkey", max_days=180)
        .alias("shifted_us"),
    )


@query("lens_json_field")
def lens_json_field(spark, sf_dir):
    from pyspark.sql.types import StringType, StructField, StructType

    c = _t(spark, sf_dir, "customer")
    schema = StructType([
        StructField("name", StringType()),
        StructField("seg", StringType()),
    ])
    json_col = F.to_json(
        F.struct(F.col("c_name").alias("name"), F.col("c_mktsegment").alias("seg"))
    )
    lens_fn = lens_mod.compile_native(
        lens_mod.Field("name"), lambda col: A.full_name(col), schema
    )
    return c.select("c_custkey", lens_fn(json_col).alias("profile_json"))


# ---------------------------------------------------------------------------
# Spec engine: projection / fixed / top-k / subsetting (SURVEY §2.2, §2.3, §2.6)
# ---------------------------------------------------------------------------


@query("spec_project_fixed")
def spec_project_fixed(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    spec = TableSpec.select(lambda r: [
        r.c_custkey,
        r.c_acctbal.nulled,
        r.c_mktsegment,
        r["c_name"].set_to("REDACTED"),
    ]).where("c_custkey % 2 = 0")
    return apply_spec(c, spec)


@query("spec_topk_orders")
def spec_topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "id")
    spec = TableSpec.select(lambda r: [
        r.id, r.o_custkey, r.o_totalprice, r.o_orderstatus,
    ]).with_limit(100)
    return apply_spec(o, spec)


def _tpch_catalog() -> Catalog:
    return Catalog.declared(
        columns={
            "region": ["r_regionkey", "r_name"],
            "nation": ["n_nationkey", "n_name", "n_regionkey"],
            "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
            "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority"],
            "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                          "l_returnflag", "l_linestatus", "l_shipdate"],
        },
        primary_keys={"region": {"r_regionkey"}, "nation": {"n_nationkey"},
                      "customer": {"c_custkey"}, "orders": {"o_orderkey"}},
        foreign_keys=[
            LogicalFK(None, "nation", "region", (("n_regionkey", "r_regionkey"),)),
            LogicalFK(None, "customer", "nation", (("c_nationkey", "n_nationkey"),)),
            LogicalFK(None, "orders", "customer", (("o_custkey", "c_custkey"),)),
            LogicalFK(None, "lineitem", "orders", (("l_orderkey", "o_orderkey"),)),
        ],
    )


@query("spec_subset_region")
def spec_subset_region(spark, sf_dir):
    dfs = {n: _t(spark, sf_dir, n) for n in ["region", "nation", "customer"]}
    out = apply_subsetting(dfs, _tpch_catalog(), {"region": "r_regionkey = 0"})
    return out["customer"].select(
        "c_custkey", "c_nationkey", A.full_name("c_name").alias("anon_name")
    )


@query("spec_subset_chain")
def spec_subset_chain(spark, sf_dir):
    dfs = {n: _t(spark, sf_dir, n) for n in ["customer", "orders", "lineitem"]}
    out = apply_subsetting(dfs, _tpch_catalog(), {"customer": "c_custkey < 50"})
    return out["lineitem"].select("l_orderkey", "l_linenumber", "l_quantity")


@query("selfref_closure")
def selfref_closure(spark, sf_dir):
    """Recursive self-ref closure (heap-shaped tree derived from nation:
    parent(k) = (k-1) div 2, roots at k=0). Filter drops nationkey 5; the
    whole subtree under 5 must vanish even where descendants pass."""
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.when(F.col("n_nationkey") == 0, F.lit(None).cast("int"))
        .otherwise(F.expr("CAST((n_nationkey - 1) div 2 AS INT)")).alias("parent_key"),
        "n_name",
    )
    cat = Catalog.declared(
        columns={"tree": ["n_nationkey", "parent_key", "n_name"]},
        primary_keys={"tree": {"n_nationkey"}},
        foreign_keys=[LogicalFK(None, "tree", "tree", (("parent_key", "n_nationkey"),))],
    )
    out = apply_subsetting({"tree": n}, cat, {"tree": "n_nationkey <> 5"})
    return out["tree"].select("n_nationkey", "parent_key")


# ---------------------------------------------------------------------------
# Relational analytics (SURVEY §2.12 — joins/aggs/windows/set-ops)
# ---------------------------------------------------------------------------


@query("q1_pricing_summary")
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    one = F.lit(1).cast("decimal(4,2)")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec(F.col("l_quantity"))).alias("__sum_qty"),
        F.sum(_dec(F.col("l_extendedprice"))).alias("__sum_base"),
        F.sum(_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"), 4, 2))
              ).alias("__sum_disc"),
        F.sum(_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"), 4, 2))
              * (one + _dec(F.col("l_tax"), 4, 2))).alias("__sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag", "l_linestatus",
        F.col("__sum_qty").cast("double").alias("sum_qty"),
        F.col("__sum_base").cast("double").alias("sum_base_price"),
        F.col("__sum_disc").cast("double").alias("sum_disc_price"),
        F.col("__sum_charge").cast("double").alias("sum_charge"),
        (F.col("__sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("__sum_base").cast("double") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


@query("q3_shipping_priority")
def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-01-01"))
    one = F.lit(1).cast("decimal(4,2)")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderpriority").agg(
        F.sum(_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"), 4, 2))
              ).alias("__rev")
    )
    return (
        agg.select("l_orderkey", "o_orderpriority",
                   F.col("__rev").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query("q5_region_revenue")
def q5_region_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region").where(F.col("r_regionkey") <= 2)
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(4,2)")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    agg = joined.groupBy("n_name").agg(
        F.sum(_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"), 4, 2))
              ).alias("__rev"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return agg.select("n_name", F.col("__rev").cast("double").alias("revenue"), "n_items")


@query("window_top_orders")
def window_top_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query("window_running_totals")
def window_running_totals(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("running_total"),
        F.lag("o_orderkey", 1).over(
            Window.partitionBy("o_custkey").orderBy("o_orderkey")
        ).alias("prev_orderkey"),
    )


@query("setop_except")
def setop_except(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    all_buyers = o.select(F.col("o_custkey").alias("custkey")).distinct()
    finished = o.where(F.col("o_orderstatus") == "F") \
        .select(F.col("o_custkey").alias("custkey")).distinct()
    return all_buyers.subtract(finished)


@query("setop_intersect_union")
def setop_intersect_union(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    open_b = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"))
    pending = o.where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey"))
    both = open_b.intersect(pending)
    return both.union(pending.limit(0)).distinct()


@query("agg_segment_stats")
def agg_segment_stats(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.min(F.col("c_acctbal")).alias("min_bal"),
        F.max(F.col("c_acctbal")).alias("max_bal"),
        F.sum(_dec(F.col("c_acctbal"))).alias("__sum_bal"),
    )
    return agg.select(
        "c_mktsegment", "n_customers", "n_nations", "min_bal", "max_bal",
        (F.col("__sum_bal").cast("double") / F.col("n_customers")).alias("avg_bal"),
    )


@query("agg_rollup_region")
def agg_rollup_region(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        joined.rollup("n_regionkey", "n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select("n_regionkey", "n_nationkey", "n_customers")
    )


@query("agg_cube_status")
def agg_cube_status(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select("o_orderstatus", "o_orderpriority", "n_orders")
    )


@query("agg_grouping_sets")
def agg_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


@query("pivot_segments")
def pivot_segments(spark, sf_dir):
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pivoted = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .pivot("c_mktsegment", segments)
        .count()
    )
    return pivoted.select(
        "n_regionkey",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(s.lower()) for s in segments],
    )


@query("agg_grouping_flags")
def agg_grouping_flags(spark, sf_dir):
    """CUBE with grouping() flags — the metadata columns that
    disambiguate 'NULL because rolled up' from 'NULL in the data'."""
    o = _t(spark, sf_dir, "orders")
    # grouping() must be computed INSIDE the cube aggregation — Spark
    # rejects it in a downstream projection.
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
    ).select(
        "o_orderstatus", "o_orderpriority", "n", "g_status", "g_priority"
    )


@query("scalar_regex")
def scalar_regex(spark, sf_dir):
    """Regex scalar family restricted to patterns with identical
    semantics in Java regex and RE2: extraction groups, match counts,
    anchored tests, and splitting."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1).alias("digits"),
        F.expr("regexp_count(c_name, '[0-9]')").cast("long")
        .alias("n_digits"),
        F.col("c_name").rlike("^Customer#").cast("long").alias("is_std"),
        F.regexp_replace(F.col("c_name"), "[0-9]", "#").alias("masked"),
        F.size(F.split(F.col("c_name"), "[#]")).cast("long")
        .alias("n_parts"),
    )


@query("agg_approx_distinct")
def agg_approx_distinct(spark, sf_dir):
    """Approximate aggregates (HLL++ / quantile sketch), oracle-gated via
    error-bound booleans: raw sketch values differ across engines by
    design, so each engine checks ITS OWN sketch against ITS OWN exact
    value and emits the verdict — a genuine cross-engine property (either
    side's sketch drifting past the bound fails the hash gate), plus the
    exact counts which must match bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    # Keep the DISTINCT aggregate in its own plan: mixing countDistinct
    # with TypedImperative sketch aggregates (HLL / QuantileSummaries)
    # forces a SortAggregate fallback over the Expand — measured 22 s vs
    # ~1.5 s for two hash aggregations joined on the (tiny) group key.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("__approx"),
        F.percentile_approx("l_quantity", 0.5).alias("__med"),
    )
    g = exact.join(sketches, "l_returnflag")
    return g.select(
        "l_returnflag",
        "exact_orders",
        (
            (F.abs(F.col("__approx") - F.col("exact_orders"))
             / F.col("exact_orders")) <= 0.05
        ).alias("approx_within_5pct"),
        # l_quantity is uniform over 1..50: any sane median sketch lands
        # well inside [20, 30] at every scale factor.
        F.col("__med").between(20.0, 30.0).alias("approx_median_in_range"),
    )


# ---------------------------------------------------------------------------
# Scalar function families: date/time, math, array, map (SURVEY §2.12)
# ---------------------------------------------------------------------------


@query("scalar_dates")
def scalar_dates(spark, sf_dir):
    """Date/time scalar family over o_orderdate: extraction, truncation,
    offset arithmetic, month boundaries, day diffs. Timestamps emit as
    epoch micros, dates as yyyy-MM-dd strings (tz-drift-proof)."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_dom"),
        # Spark dayofweek: 1=Sunday..7 (mirrored as dayofweek+1 in DuckDB).
        F.dayofweek(d).cast("long").alias("order_dow"),
        F.unix_micros(F.date_trunc("month", d)).alias("month_start_us"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1998-08-01").cast("date"), d.cast("date"))
        .cast("long").alias("days_to_cutoff"),
    )


@query("scalar_math")
def scalar_math(spark, sf_dir):
    """Math scalar family over lineitem: abs/floor/ceil, decimal rounding
    (HALF_UP on both engines), sqrt, products, modulo, sign, greatest/
    least — all exact or IEEE-identical cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - F.lit(30000.0)).alias("abs_off"),
        F.floor(price).cast("long").alias("price_floor"),
        F.ceil(price).cast("long").alias("price_ceil"),
        F.round(_dec(price), 1).cast("double").alias("price_round1"),
        F.sqrt(price).alias("price_sqrt"),
        (price * price).alias("price_sq"),
        (F.col("l_orderkey") % F.lit(97)).cast("long").alias("key_mod"),
        F.signum(F.col("l_discount") - F.lit(0.05)).cast("long").alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * F.lit(100.0))
        .alias("max_qd"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("min_td"),
    )


@query("scalar_collections")
def scalar_collections(spark, sf_dir):
    """Array and map scalar family: construction, size, max, indexing,
    fold-sum, sort-to-csv, split, map build/extract/keys — emitted as
    scalars so the value hash is engine-neutral."""
    c = _t(spark, sf_dir, "customer")
    arr = F.array(
        F.col("c_custkey"),
        F.col("c_nationkey"),
        (F.col("c_custkey") % F.lit(7)),
    )
    toks = F.split(F.col("c_name"), "#")
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"), F.lit("name"), F.col("c_name")
    )
    return c.select(
        "c_custkey",
        F.size(arr).cast("long").alias("arr_len"),
        F.array_max(arr).alias("arr_max"),
        F.element_at(arr, 3).alias("arr_third"),
        F.aggregate(arr, F.lit(0).cast("long"), lambda a, v: a + v).alias("arr_sum"),
        F.concat_ws(",", F.transform(F.array_sort(arr), lambda x: x.cast("string")))
        .alias("arr_sorted_csv"),
        F.size(toks).cast("long").alias("n_name_parts"),
        F.element_at(m, F.lit("seg")).alias("map_seg"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("map_keys_csv"),
        F.size(m).cast("long").alias("map_len"),
    )


# ---------------------------------------------------------------------------
# Streaming-shaped (batch-mode equivalents; SURVEY §7 north-star)
# ---------------------------------------------------------------------------


@query("sql_front_door")
def sql_front_door(spark, sf_dir):
    """Pure SQL-text execution path (session.register_tables): fixture
    views + registered anon_* SQL functions, driven entirely through
    spark.sql — same plans, same values as the DataFrame API."""
    from .session import register_tables

    register_tables(spark, sf_dir, ["customer", "nation"])
    return spark.sql("""
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_balance,
               CAST(min(anon_stable_hash(c_name)) AS BIGINT)
                 AS min_name_hash
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """)


@query("config_front_door")
def config_front_door(spark, sf_dir):
    """JSON policy-document execution path (plans/spec_config.py): the
    reviewable-config twin of sql_front_door. A JSON doc exercising every
    column config shape (passthrough / anonymizer-by-name / null / set
    constant) plus a where filter compiles to the SAME TableSpec the code
    DSL builds, then runs through the same compiler — so this gate covers
    the whole config->spec->plan path end-to-end."""
    import json as _json

    from .plans.spec_config import specs_from_json

    c = _t(spark, sf_dir, "customer")
    policy = _json.dumps({
        "customer": {
            "where": "c_custkey % 3 = 0",
            "columns": {
                "c_custkey": "passthrough",
                "c_name": "full_name",
                "c_acctbal": "null",
                "c_mktsegment": {"set": "MASKED"},
            },
        },
    })
    spec = specs_from_json(policy)["customer"]
    return apply_spec(c, spec)


@query("scalar_strings")
def scalar_strings(spark, sf_dir):
    """Portable string-function family: case, slicing, padding,
    replace/translate masking, split_part, position, ascii, repeat —
    restricted to functions with identical semantics in both engines."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("up"),
        F.expr("left(c_name, 8)").alias("l8"),
        F.expr("right(c_name, 4)").alias("r4"),
        F.lpad(F.col("c_name"), 22, "*").alias("padded"),
        F.expr("replace(c_name, 'Customer', 'Anon')").alias("replaced"),
        F.reverse(F.col("c_name")).alias("rev"),
        F.expr("split_part(c_name, '#', 2)").alias("num_part"),
        F.expr("instr(c_name, '#')").cast("long").alias("hash_pos"),
        F.translate(F.col("c_name"), "0123456789", "##########")
        .alias("masked"),
        F.ascii(F.substring(F.col("c_name"), 1, 1)).cast("long")
        .alias("first_ascii"),
        F.repeat(F.substring(F.col("c_name"), 1, 2), 3).alias("rep"),
    )


@query("events_tumbling")
def events_tumbling(spark, sf_dir):
    return streaming_events.tumbling_counts(_t(spark, sf_dir, "events"))


@query("events_sliding")
def events_sliding(spark, sf_dir):
    return streaming_events.sliding_user_activity(_t(spark, sf_dir, "events"))


@query("events_sessionize")
def events_sessionize(spark, sf_dir):
    return streaming_events.sessionize(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Dedup / similarity / text analysis / multimodal (north-star extensions)
# ---------------------------------------------------------------------------


@query("dedup_exact")
def dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


@query("dedup_distinct_docs")
def dedup_distinct_docs(spark, sf_dir):
    """The deduplicated corpus: min-id keeper row per distinct text."""
    return dedup.distinct_documents(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark, sf_dir):
    """Oracle split: hash_shingles=False because the DuckDB mirror
    scores TEXT shingle Jaccard (xxhash64 has no DuckDB mirror); the
    operator's own default is the scale-safe hashed verify payload."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), jaccard_threshold=0.3,
        hash_shingles=False,
    )


@query("dedup_simhash")
def dedup_simhash(spark, sf_dir):
    return dedup.simhash_signatures(_t(spark, sf_dir, "documents"))


@query("dedup_simhash_pairs")
def dedup_simhash_pairs(spark, sf_dir):
    """Banded SimHash Hamming near-dup JOIN (dedup.simhash_neardup_pairs):
    pigeonhole blocking over 4 contiguous 8-bit signature blocks gives
    exact recall at Hamming <= 3 (a pair within distance 3 must agree on
    at least one of 4 blocks); candidates verify via bit_count(xor) on
    the signatures carried through the bucket — no second text scan."""
    return dedup.simhash_neardup_pairs(_t(spark, sf_dir, "documents"))


@query("ngram_jaccard_adjacent")
def ngram_jaccard_adjacent(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pairs = d.select(F.col("doc_id").alias("id_a"),
                     (F.col("doc_id") + 1).alias("id_b"))
    return dedup.ngram_jaccard_pairs(d, pairs)


@query("doc_fingerprint")
def doc_fingerprint(spark, sf_dir):
    return dedup.fingerprints(_t(spark, sf_dir, "documents"))


@query("token_count_bpe")
def token_count_bpe(spark, sf_dir):
    """BPE-ish regex token count (words / numbers / single punctuation) —
    the pre-tokenization pass of GPT-style tokenizers, RE2-safe so the
    DuckDB oracle matches byte-for-byte."""
    d = _t(spark, sf_dir, "documents")
    pattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{pattern}', 0)"))
        .cast("long").alias("n_bpe_tokens"),
    )


@query("text_stats")
def text_stats(spark, sf_dir):
    return text_analysis.text_stats(_t(spark, sf_dir, "documents"))


@query("text_quality")
def text_quality(spark, sf_dir):
    return text_analysis.quality_score(_t(spark, sf_dir, "documents"))


@query("lang_id")
def lang_id(spark, sf_dir):
    return text_analysis.language_id(_t(spark, sf_dir, "documents"))


@query("text_cdc_chunks")
def text_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (textprep.cdc_chunks): rolling-window
    hash boundaries + max-length force splits, map-only — the
    shift-robust sub-document dedup primitive."""
    from .operators.textprep import cdc_chunks

    return cdc_chunks(_t(spark, sf_dir, "documents"))


@query("dedup_chunk_overlap")
def dedup_chunk_overlap(spark, sf_dir):
    """Sub-document duplication report: CDC chunks shared by more than
    one document (textprep.cdc_chunks -> hash groupBy). Content-defined
    boundaries make this catch COPIED PASSAGES even when surrounding
    text shifts their offsets — the chunk-level complement of whole-doc
    dedup. Tiny chunks (< 20 chars) are noise and excluded."""
    from .functions.hashing import stable_hash
    from .operators.textprep import cdc_chunks

    ch = cdc_chunks(_t(spark, sf_dir, "documents"))
    return (
        ch.where(F.col("chunk_len") >= 20)
        .groupBy(F.col("chunk_text"))
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            stable_hash(F.col("chunk_text")).alias("chunk_hash"),
            F.length(F.col("chunk_text")).cast("long").alias("chunk_len"),
            "n_docs", "n_occurrences", "first_doc",
        )
    )


@query("text_normalize")
def text_normalize(spark, sf_dir):
    """Whitespace/control-char normalization report
    (textprep.normalize_documents): cleaned text + exact removed-char
    accounting in one map-only regexp chain."""
    from .operators.textprep import normalize_documents

    return normalize_documents(_t(spark, sf_dir, "documents"))


@query("html_extract_docs")
def html_extract_docs(spark, sf_dir):
    """HTML -> text extraction (textprep.html_extract_documents): the
    boilerplate-strip stage between WARC ingest and normalization. The
    fixture rows are wrapped in the shared page skeleton
    (``HTML_DEMO_SEGMENTS``) so the oracle gates script/style/comment
    removal, block-structure newlines, single-pass entity decode, title
    capture, and the link census — all as one map-only native regexp
    chain (no Python)."""
    from .operators import textprep

    seg = textprep.HTML_DEMO_SEGMENTS
    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(seg[0]), F.col("doc_id").cast("string"),
        F.lit(seg[1]), F.col("lang"),
        F.lit(seg[2]), F.col("text"),
        F.lit(seg[3]), F.col("source"),
        F.lit(seg[4]), F.col("doc_id").cast("string"),
        F.lit(seg[5]),
    )
    return textprep.html_extract_documents(
        docs.select("doc_id", html.alias("html"))
    )


def _demo_urls(spark, sf_dir):
    """documents -> (doc_id, url) through the shared URL_DEMO_SEGMENTS
    template (one source of truth with the oracle's SQL builder)."""
    from .operators.urls import URL_DEMO_SEGMENTS

    docs = _t(spark, sf_dir, "documents")
    branches = F.when(F.lit(False), F.lit(""))
    for k, (a, b, c) in URL_DEMO_SEGMENTS.items():
        branches = branches.when(
            F.col("doc_id") % 3 == k,
            F.concat(F.lit(a), F.col("source"), F.lit(b),
                     F.col("doc_id").cast("string"), F.lit(c)),
        )
    return docs.select("doc_id", branches.alias("url"))


@query("url_parse_docs")
def url_parse_docs(spark, sf_dir):
    """URL parsing + crawler canonicalization (operators/urls.py): RFC
    3986 Appendix B reference-regex parts, lowercased scheme/host,
    default-port and fragment drop, tracking-parameter removal, sorted
    query keys, PSL-head registered domain. Gated over the three
    synthesized URL shapes (URL_DEMO_SEGMENTS) wrapped around every
    fixture row — pure projection, no shuffle, no Python."""
    from .operators.urls import parse_urls

    return parse_urls(_demo_urls(spark, sf_dir))


@query("url_domain_stats")
def url_domain_stats(spark, sf_dir):
    """Per-registered-domain crawl census (operators/urls.py): URL /
    distinct-host / distinct-canonical counts, exact https numerator,
    mean path depth as one division of exact integer sums. One hash
    aggregation on the bounded domain key."""
    from .operators import urls

    return urls.url_domain_stats(_demo_urls(spark, sf_dir))


@query("anon_fpe_orders")
def anon_fpe_orders(spark, sf_dir):
    """Format-preserving encryption (anonymizers.fpe_digits): every
    order key becomes a 12-digit PAN, encrypts under the FF1-shaped
    alternating Feistel (md5 round function, length-as-tweak), and
    decrypts back in the same plan — the oracle unrolls all 16 Feistel
    rounds as MATERIALIZED CTEs and must agree on ciphertext AND
    recovered plaintext digit-for-digit. One narrow Project per round,
    map-only."""
    from .functions.anonymizers import fpe_digits

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("card"),
    )
    enc = fpe_digits(orders, "card", "enc", key="fpe-demo")
    dec = fpe_digits(enc, "enc", "dec", key="fpe-demo", decrypt=True)
    return dec.select("o_orderkey", "card", "enc", "dec")


@query("pipeline_web_corpus")
def pipeline_web_corpus(spark, sf_dir):
    """Round-6 operators composed end-to-end, the web-corpus intake
    shape: normalize text -> canonical exact-dedup on the normalized
    form (min doc id survives, min_by carries its source) -> per-domain
    cap of 10 (skew-safe per_group_cap) -> leakage-safe grouped split ->
    per-split summary. One integration gate over the whole new chain."""
    from .operators.sampling import grouped_split, per_group_cap
    from .operators.textprep import normalize_text

    d = _t(spark, sf_dir, "documents")
    norm = d.select("doc_id", normalize_text(F.col("text")).alias("text"))
    # min_by(source, doc_id) kept a STRING aggregation buffer, which
    # can't hash-aggregate — the whole canon dedup planned as
    # SortAggregate pairs (x4: downstream referenced the subtree four
    # times). doc_id is the PK, so the survivor's source comes from a
    # plain PK join against the RAW table instead (identical rows,
    # proved against the oracle), min(long) hash-aggregates, and the
    # canon table materializes ONCE for the cap/split/summary passes.
    canon = (
        norm.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(d.select("doc_id", "source"), "doc_id")
        .localCheckpoint(eager=True)
    )
    capped = per_group_cap(canon, "source", 10, "doc_id")
    split = grouped_split(capped, "source")
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.sum(F.size(T.tokens(F.col("text")))).cast("long")
            .alias("total_tokens"),
        )
    )


@query("dq_table_checksum")
def dq_table_checksum(spark, sf_dir):
    """Order-insensitive migration checksum
    (quality_audit.table_checksum) over orders' engine-stable columns —
    the certify-the-copy primitive for compaction / format conversion /
    MERGE swaps."""
    from .operators.quality_audit import table_checksum

    o = _t(spark, sf_dir, "orders")
    return table_checksum(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@query("corpus_report")
def corpus_report(spark, sf_dir):
    """One-row corpus dataset card: doc/language/distinct-text counts,
    char/token totals, exact-dup ratio, mean tokens per doc — ONE
    combinable aggregation pass (two distinct counts + plain sums), no
    joins; the divisions are single IEEE ops on exact integers."""
    from .functions.hashing import stable_hash

    d = _t(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_languages"),
        F.countDistinct(stable_hash(F.col("text"))).cast("long")
        .alias("n_distinct_texts"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.size(T.tokens(F.col("text")))).cast("long")
        .alias("total_tokens"),
    )
    return agg.select(
        "*",
        ((F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
         / F.col("n_docs").cast("double")).alias("exact_dup_ratio"),
        (F.col("total_tokens").cast("double")
         / F.col("n_docs").cast("double")).alias("mean_doc_tokens"),
    )


@query("quality_gopher_flags")
def quality_gopher_flags(spark, sf_dir):
    """Gopher §A1.1 quality rules (text_analysis.gopher_quality_flags):
    seven per-rule booleans + overall keep, every threshold an exact
    integer cross-multiplication — a single map-only corpus pass."""
    return text_analysis.gopher_quality_flags(_t(spark, sf_dir, "documents"))


@query("embedding_topk")
def embedding_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(e, e.where(F.col("vec_id") < 5), k=3)


@query("embedding_neardup")
def embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, banded hyperplane-LSH
    candidates (4 bands x 8 planes — OR over bands keeps recall while each
    band's 256 buckets keep the within-bucket join near-linear).

    The fixture embeddings are mutually far apart (max pair cosine ≈ 0.5
    at sf0.01 — round-10 verdict: the 0.9 gate verified emptiness only),
    so the corpus is salted with deterministic near-duplicates built from
    the fixture itself: every 25th vector is re-emitted (id + 10M) as
    ``v + 0.125·reverse(v)`` — cosine(v, v') ≈ 0.992, and 0.125 is a
    power of two so the perturbed elements are single exact IEEE double
    ops on both engines. The LSH candidate path, bucket cap, and exact
    cosine verify then run on REAL near-dup structure at every scale
    (20/20/80 seeded pairs at sf0.001/0.01/0.1)."""
    e = dedup.ensure_parallelism(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    seeds = e.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + F.lit(10000000).cast("long")).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.reverse(F.col("embedding")),
            lambda x, y: x + F.lit(0.125) * y,
        ).alias("embedding"),
    )
    return similarity.embedding_neardup_pairs(
        e.unionByName(seeds), threshold=0.9, bands=4, planes_per_band=8
    )


@query("embedding_topk_lsh")
def embedding_topk_lsh(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(e, e.where(F.col("vec_id") < 5), k=3, planes=4)


@query("embedding_quantize_int8")
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 vector quantization (similarity.quantize_int8):
    per-vector scale + codes + reconstruction bound, all in one
    map-only pass of IEEE-identical double arithmetic. Codes are
    emitted as CSV (the repo's scalar-output convention,
    operators/textprep.py: encode_documents) — the driver's pandas
    canonicalizer cannot sort list-typed columns."""
    q = similarity.quantize_int8(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("codes").cast("array<string>"), ",").alias(
            "codes_csv"
        ),
        "max_abs_err",
    )


@query("embedding_topk_pq")
def embedding_topk_pq(spark, sf_dir):
    """Product-quantized top-3 (similarity.pq_topk): 8 subspaces x 8
    centroids, asymmetric-distance scan over code arrays — 256-byte
    vectors compressed to 8 codes; scores in 2^-24 fixed point for
    order-free cross-engine sums."""
    e = dedup.ensure_parallelism(_t(spark, sf_dir, "embeddings"))
    cb = similarity.pq_codebooks(e, m=8, sub_dim=8, k=8)
    return similarity.pq_topk(e, e.where(F.col("vec_id") < 5), cb, k=3)


@query("ann_recall_lsh")
def ann_recall_lsh(spark, sf_dir):
    """Measured recall@3 of the 4-plane LSH top-k against exact
    brute-force top-k for the same 5 query vectors
    (similarity.ann_recall_report) — the index-quality gauge."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.ann_recall_report(
        e, e.where(F.col("vec_id") < 5), k=3, planes=4
    )


@query("events_asof_signup")
def events_asof_signup(spark, sf_dir):
    """As-of join: every event matched to the user's most recent strictly
    earlier signup event."""
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # Pre-aggregate to unique (user_id, ts): DuckDB's ASOF JOIN picks an
    # arbitrary row among equal right timestamps, so the parity gate needs
    # tie-free right rows on BOTH sides.
    signups = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event"))
    )
    joined = asof_join(
        ev, signups, key_cols=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["signup_event"],
    )
    return joined.select(
        "event_id", "user_id", F.col("signup_event_asof").alias("signup_event")
    )


@query("join_anti_customers")
def join_anti_customers(spark, sf_dir):
    """Customers with no URGENT orders — left anti join against the
    filtered fact side (filter pushed below the anti join, so the build
    side shrinks 5x before the shuffle).

    The unfiltered variant ("no orders at all") gates on emptiness at
    the driver's sf0.01 — every fixture customer has at least one order
    there (round-10 verdict); the priority slice leaves 18/203/1986
    childless customers at sf0.001/0.01/0.1, so the anti-join semantics
    are verified on real rows at every scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query("multimodal_jpeg_roundtrip")
def multimodal_jpeg_roundtrip(spark, sf_dir):
    """The real baseline JPEG codec gated through the driver: flat 8x8
    blocks at quality 100 are exactly lossless, so the decoded pixel
    sums are closed forms of doc_id. Sampled to every 10th document —
    pure-Python decode, the query bounds its own row count."""
    from .operators.multimodal import synthetic_jpeg_roundtrip

    return synthetic_jpeg_roundtrip(_t(spark, sf_dir, "documents"))


@query("multimodal_image_meta")
def multimodal_image_meta(spark, sf_dir):
    """The real PNG codec gated through the driver: one pandas stage
    encodes a flat grayscale PNG per document and decodes it back —
    dimensions and decoded pixel sum are closed forms of
    (doc_id, n_chars), so the hash covers the zlib/filter round trip."""
    from .operators.multimodal import synthetic_image_meta

    return synthetic_image_meta(_t(spark, sf_dir, "documents"))


@query("multimodal_audio_features")
def multimodal_audio_features(spark, sf_dir):
    """PCM feature extraction through the REAL WAV decoder, driver-
    verifiable: one pandas stage synthesizes an alternating-sign mono
    wave per document and decodes it back — every feature a closed form
    of (doc_id, n_chars), so the hash gates the decoder."""
    from .operators.multimodal import synthetic_audio_features

    return synthetic_audio_features(_t(spark, sf_dir, "documents"))


@query("multimodal_video_meta")
def multimodal_video_meta(spark, sf_dir):
    """Video-container metadata through the REAL parser, driver-
    verifiable: one pandas stage synthesizes a deterministic MP4 per
    document (timescale 1000, duration ticks = n_chars * 40, dims
    derived from doc_id) with the repo's own box builders, then parses
    it back with codecs.mp4_meta — so the oracle is the closed form of
    the synthesis, and a parser regression breaks the hash match."""
    from .operators.multimodal import synthetic_video_meta

    return synthetic_video_meta(_t(spark, sf_dir, "documents"))


@query("multimodal_video_frames")
def multimodal_video_frames(spark, sf_dir):
    """Video FRAME decode through the REAL read path, driver-verifiable
    (the moving-picture completion of the synthesis family): per
    sampled document, flat JPEG frames are muxed into a Motion-JPEG AVI
    and the whole demux + per-frame JPEG decode runs for real inside
    one pandas stage — pixel sums are closed forms of (doc_id,
    frame_idx), so the hash gates muxer, demuxer, and codec at once."""
    from .operators.multimodal import synthetic_mjpeg_frames

    return synthetic_mjpeg_frames(_t(spark, sf_dir, "documents"))


@query("avro_roundtrip_docs")
def avro_roundtrip_docs(spark, sf_dir):
    """Avro interchange, driver-verifiable end-to-end: the documents
    table is written to real Avro Object Container Files (the
    from-scratch stdlib writer in ``sources/avro.py`` — zigzag varints,
    deflate blocks, sync markers) and read back through the matching
    from-scratch reader; the oracle is simply the source table, so the
    driver's value hash gates BOTH sides of the codec. One container
    file per partition (executor-side IO), one decode task per file."""

    from .sources.avro import read_avro, write_avro

    out = _scratch("avro_rt_")
    write_avro(_t(spark, sf_dir, "documents"), out)
    return read_avro(spark, out)


@query("warc_roundtrip_docs")
def warc_roundtrip_docs(spark, sf_dir):
    """WARC interchange, driver-verifiable end-to-end: the documents
    table is written as real per-record-gzipped WARC resource records
    (the from-scratch ISO 28500 codec in ``sources/warc.py`` — the
    Common Crawl container, i.e. the raw landing format of web-scale
    training corpora) and read back through the matching reader; the
    original columns are reconstructed from payload + extension header
    fields, so the oracle is simply the source table and the driver's
    value hash gates BOTH codec directions. One archive per partition
    (executor-side IO), one decode task per file."""

    from .sources.warc import read_warc, write_warc

    docs = _t(spark, sf_dir, "documents").withColumn(
        "uri", F.concat(F.lit("corpus://"), F.col("source"), F.lit("/"),
                        F.col("doc_id")))
    out = _scratch("warc_rt_")
    write_warc(docs, out, uri_col="uri", payload_col="text",
               meta_cols=("doc_id", "lang", "source", "n_chars"))
    back = read_warc(spark, out)
    return back.select(
        F.element_at("headers", "warc-x-meta-doc_id").cast("long")
        .alias("doc_id"),
        F.col("payload").cast("string").alias("text"),
        F.element_at("headers", "warc-x-meta-lang").alias("lang"),
        F.element_at("headers", "warc-x-meta-source").alias("source"),
        F.element_at("headers", "warc-x-meta-n_chars").cast("long")
        .alias("n_chars"),
    )


@query("multimodal_meta")
def multimodal_meta(spark, sf_dir):
    from .operators import multimodal

    media = multimodal.with_binary_content(_tp(spark, sf_dir, "documents"))
    return multimodal.extract_meta(media).select("media_id", "n_bytes", "content_hash")


@query("merge_upsert")
def merge_upsert(spark, sf_dir):
    """MERGE (upsert) as a relational transformation — the parquet-sink
    analog of ON CONFLICT DO UPDATE (``src/OnConflict.scala:32-39``):
    matched keys take source values, unmatched source rows append."""
    from .plans.on_conflict import OnConflict
    from .sources.merge import merge_dataframes

    cols = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]
    target = _t(spark, sf_dir, "customer").select(*cols)
    updates = (
        target.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_name", F.concat(F.lit("UPDATED "), F.col("c_name")))
        .withColumn("c_acctbal", F.col("c_acctbal") * 2)
    )
    inserts = target.filter(F.col("c_custkey") % 11 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1000000).cast("bigint")
    )
    source = updates.unionByName(inserts)
    return merge_dataframes(target, source, ["c_custkey"], OnConflict.do_update())


@query("embedding_topk_ivf")
def embedding_topk_ivf(spark, sf_dir):
    """IVF-probed ANN (cells = deterministic coarse quantizer, nprobe=2) —
    the FAISS-style scale path next to the LSH one."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        e, e.where(F.col("vec_id") < 5), k=3, n_cells=8, nprobe=2
    )


@query("range_join_shipments")
def range_join_shipments(spark, sf_dir):
    """Point-in-interval range join (binned equi-join, not BNLJ): lineitems
    shipped within 7 days of a sampled order's date, aggregated per order."""
    from .operators.range_join import binned_range_join

    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("__lo"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("__hi"),
        )
    )
    l = _t(spark, sf_dir, "lineitem").select("l_shipdate", "l_quantity")
    j = binned_range_join(l, o, "l_shipdate", "__lo", "__hi", bin_width_days=7)
    return j.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_shipped"),
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
    )


@query("dedup_clusters")
def dedup_clusters(spark, sf_dir):
    """Duplicate-cluster resolution: connected components over the MinHash
    near-dup pair graph; every document labeled with its cluster's minimum
    doc_id (singletons label themselves)."""
    from .operators.components import connected_components

    docs = _t(spark, sf_dir, "documents")
    # hash_shingles=False: oracle bit-parity (text-Jaccard DuckDB mirror)
    pairs = dedup.minhash_lsh_pairs(
        docs, jaccard_threshold=0.3, hash_shingles=False)
    return connected_components(
        pairs, nodes=docs.select(F.col("doc_id").alias("node"))
    )


@query("dedup_golden_records")
def dedup_golden_records(spark, sf_dir):
    """Survivorship election over the MinHash duplicate clusters
    (components.golden_records): each cluster keeps its longest document
    (doc_id ascending on ties) as the canonical record."""
    from .operators.components import connected_components, golden_records

    docs = _t(spark, sf_dir, "documents")
    # hash_shingles=False: oracle bit-parity (text-Jaccard DuckDB mirror)
    pairs = dedup.minhash_lsh_pairs(
        docs, jaccard_threshold=0.3, hash_shingles=False)
    labels = connected_components(
        pairs, nodes=docs.select(F.col("doc_id").alias("node"))
    )
    return golden_records(
        docs.select("doc_id", "text"), labels, "doc_id",
        F.length(F.col("text")),
    )


@query("sample_split_by_source")
def sample_split_by_source(spark, sf_dir):
    """Leakage-safe split (sampling.grouped_split): the split key is the
    SOURCE, so intra-domain near-duplicates can never straddle
    train/test — the contamination guard row-keyed splits lack."""
    from .operators.sampling import grouped_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return grouped_split(d, "source")


@query("sample_domain_cap")
def sample_domain_cap(spark, sf_dir):
    """Per-domain document quota (sampling.per_group_cap): at most 10
    docs per source, chosen by deterministic hash order — the hub-domain
    cap of a web-corpus mix, with the skew-safe bucket-threshold
    selection instead of one giant per-group window."""
    from .operators import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.per_group_cap(d, "source", 10, "doc_id")


@query("sample_stratified")
def sample_stratified(spark, sf_dir):
    """Deterministic per-stratum sampling (sampleBy without RNG): keyed
    hash-threshold filter, reproducible across engines and partitionings."""
    from .operators import sampling

    c = _t(spark, sf_dir, "customer")
    out = sampling.stratified_sample(
        c, "c_mktsegment", {"BUILDING": 0.5, "MACHINERY": 0.25},
        key_col="c_custkey", default_rate=0.1,
    )
    return out.select("c_custkey", "c_mktsegment")


@query("sample_split")
def sample_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment per key."""
    from .operators import sampling

    c = _t(spark, sf_dir, "customer")
    return sampling.train_val_test_split(c, "c_custkey").select(
        "c_custkey", "split"
    )


@query("text_scrub_pii")
def text_scrub_pii(spark, sf_dir):
    """Free-text PII scrubbing: emails/URLs/phones/IPs -> typed tokens.
    PII is synthesized deterministically into each document so the rewrite
    is exercised on every row."""
    from .operators.textprep import scrub_pii

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("Contact "), F.substring("text", 1, 40),
        F.lit(" at j"), F.col("doc_id").cast("string"),
        F.lit(".doe@example.com or (555) 123-4567, see https://ex.io/p?q="),
        F.col("doc_id").cast("string"),
        F.lit(" from 10.0.0."), (F.col("doc_id") % 256).cast("string"),
    )
    return d.select("doc_id", scrub_pii(raw).alias("scrubbed"))


@query("text_chunks")
def text_chunks(spark, sf_dir):
    """Overlapping token-window chunking (32-token windows, stride 24) —
    the pretraining/RAG document splitter as a 1:N native explode."""
    from .operators.textprep import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, stride=24
    )


@query("pipeline_corpus")
def pipeline_corpus(spark, sf_dir):
    """The whole training-corpus pipeline composed end-to-end: near-dup
    cluster resolution -> keep one canonical doc per cluster -> quality
    filter -> PII scrub -> deterministic split -> token-window chunking.
    Every stage is an operator with its own oracle; this query gates the
    COMPOSITION.

    Cost floor (~4.3 s warm at sf0.1): the round-5 carry_cols fix
    removed the join-back that re-executed the upstream twice (6.8 ->
    4.3 s); what remains is the sum of the constituent operators
    measured alone — MinHash banding ~1.4 s, the 5-gram
    shingle-diversity quality scorer ~2.0 s, plus bounded
    connected-components iterations and the scrub/chunk rewrite. No
    stage re-executes; each input scan feeds a different computation."""
    from .operators import sampling
    from .operators.components import connected_components
    from .operators.textprep import chunk_documents, scrub_pii

    docs = _t(spark, sf_dir, "documents")
    comp = connected_components(
        # hash_shingles=False: oracle bit-parity (text-Jaccard mirror)
        dedup.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, hash_shingles=False),
        nodes=docs.select(F.col("doc_id").alias("node")),
    )
    canonical = comp.where(F.col("node") == F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    good = (
        text_analysis.quality_score(docs)
        .where(F.col("shingle_diversity") >= 0.5)
        .select("doc_id")
    )
    kept = (
        docs.join(canonical, "doc_id")
        .join(good, "doc_id")
        .where(F.length("text") >= 50)
    )
    scrubbed = kept.select("doc_id", scrub_pii(F.col("text")).alias("text"))
    split = sampling.train_val_test_split(scrubbed, "doc_id")
    # carry the split label THROUGH the chunk explode instead of joining
    # chunks back to `split` — the join referenced the whole upstream
    # (LSH pairs -> connected components -> scrub) in a second branch and
    # re-executed it; carrying the column is map-side and free.
    chunks = chunk_documents(split, chunk_size=32, stride=24,
                             carry_cols=("split",))
    return chunks.select(
        "doc_id", "split", "chunk_id", "chunk_text", "n_chunk_tokens"
    )


# ---------------------------------------------------------------------------
# Descriptive statistics / profiling (operators/stats.py)
# ---------------------------------------------------------------------------


@query("agg_median_balance")
def agg_median_balance(spark, sf_dir):
    """Exact per-segment median account balance (middle-element selection,
    no interpolation — see operators/stats.py determinism contract)."""
    from .operators import stats

    return stats.grouped_median(
        _t(spark, sf_dir, "customer"), ["c_mktsegment"], "c_acctbal", "c_custkey"
    )


@query("agg_stats_moments")
def agg_stats_moments(spark, sf_dir):
    """Single-pass n/mean/stddev/min/max per order status via exact
    DECIMAL moment sums + IEEE-deterministic double combine."""
    from .operators import stats

    return stats.moments(_t(spark, sf_dir, "orders"), ["o_orderstatus"], "o_totalprice")


@query("agg_corr_qty_price")
def agg_corr_qty_price(spark, sf_dir):
    """Pearson correlation of quantity vs extended price per return flag —
    co-moment sums in DECIMAL, combined engine-identically."""
    from .operators import stats

    return stats.corr_pair(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_quantity", "l_extendedprice"
    )


@query("histogram_order_prices")
def histogram_order_prices(spark, sf_dir):
    """Fixed-width price histogram ($50k bins) via exact integer-cents
    binning (DuckDB has no width_bucket; integer div is engine-identical)."""
    from .operators import stats

    return stats.histogram(_t(spark, sf_dir, "orders"), "o_totalprice", 5_000_000)


@query("rolling_user_activity")
def rolling_user_activity(spark, sf_dir):
    """Per-event trailing-1h count and value sum per user — RANGE frame on
    epoch micros, DECIMAL accumulation."""
    from .operators import stats

    ev = _t(spark, sf_dir, "events")
    return stats.rolling_time_agg(
        ev, "user_id", F.unix_micros(F.col("ts")), "value", "event_id",
        3_600_000_000,
    )


@query("funnel_signup_purchase")
def funnel_signup_purchase(spark, sf_dir):
    """Two-step funnel: first signup, earliest purchase at-or-after it
    within 7 days. One row per signed-up user."""
    from .operators.funnel import funnel_two_step

    ev = _t(spark, sf_dir, "events")
    return funnel_two_step(
        ev, "user_id", "event_type", F.unix_micros(F.col("ts")),
        "signup", "purchase", horizon_us=7 * 86_400_000_000,
    )


# ---------------------------------------------------------------------------
# Corpus term statistics / fuzzy matching
# ---------------------------------------------------------------------------


@query("tfidf_top_terms")
def tfidf_top_terms_q(spark, sf_dir):
    """Top-3 rarity-weighted terms per document (tf/df exact-rational
    score; ln() deliberately excluded from the determinism contract)."""
    return text_analysis.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@query("corpus_top_tokens")
def corpus_top_tokens(spark, sf_dir):
    """Corpus heavy hitters: 20 most frequent tokens, exact counts,
    token-text tie-break (TakeOrderedAndProject top-n)."""
    return text_analysis.top_tokens(_t(spark, sf_dir, "documents"), n=20)


@query("fuzzy_levenshtein")
def fuzzy_levenshtein(spark, sf_dir):
    """Edit-distance screen over adjacent-id candidate pairs on a 60-char
    prefix — the cheap pre-verify stage of fuzzy dedup."""
    return dedup.levenshtein_adjacent_pairs(_t(spark, sf_dir, "documents"), 60)


@query("agg_quartiles_status")
def agg_quartiles_status(spark, sf_dir):
    """Exact type-7 quartiles of order price per status — integer rank
    arithmetic + one IEEE interpolation (operators/stats.py)."""
    from .operators import stats

    return stats.grouped_quantiles(
        _t(spark, sf_dir, "orders"), ["o_orderstatus"], "o_totalprice",
        "o_orderkey",
    )


@query("skew_profile_orders")
def skew_profile_orders(spark, sf_dir):
    """Join-key skew report: 10 hottest customer keys in orders with exact
    counts and table share — the pre-flight for the skew playbook."""
    from .operators import stats

    return stats.key_skew_profile(_t(spark, sf_dir, "orders"), "o_custkey", 10)


@query("cohort_retention_weekly")
def cohort_retention_weekly(spark, sf_dir):
    """Weekly cohort retention matrix over events: entities bucketed by
    first-event week, activity counted per week since."""
    from .operators.cohort import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(
        ev, "user_id", F.unix_micros(F.col("ts")), 604_800_000_000
    )


@query("scd2_user_state")
def scd2_user_state(spark, sf_dir):
    """SCD2 validity intervals from the event stream: per-user runs of
    event_type with [valid_from, valid_to) epoch-micro bounds."""
    from .operators.scd import scd2_intervals

    ev = _t(spark, sf_dir, "events")
    return scd2_intervals(ev, "user_id", F.unix_micros(F.col("ts")), "event_type")


@query("funnel_three_step")
def funnel_three_step(spark, sf_dir):
    """N-step funnel (signup -> click -> purchase): earliest chain of
    events per user, one join per step."""
    from .operators.funnel import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(
        ev, "user_id", "event_type", F.unix_micros(F.col("ts")),
        ["signup", "click", "purchase"],
    )


@query("window_percentiles")
def window_percentiles(spark, sf_dir):
    """percent_rank / ntile / cume_dist over a unique (price, key) order —
    the remaining analytic-window family, exact-int divisions only."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.cume_dist().over(w).alias("cume"),
    )


@query("events_interval_join")
def events_interval_join(spark, sf_dir):
    """Interval (stream-stream-shaped) join: each purchase joined to the
    same user's clicks it follows within 1 hour — the watermark-safe join
    condition, run in batch mode for the oracle gate."""
    return streaming_events.interval_join(_t(spark, sf_dir, "events"))


@query("sample_balanced")
def sample_balanced(spark, sf_dir):
    """Class-balanced downsampling: ≤50 docs per language by
    deterministic hash rank (partition-layout independent)."""
    from .operators import sampling

    return sampling.balanced_sample(
        _t(spark, sf_dir, "documents"), "lang", 50, "doc_id"
    ).select("doc_id", "lang")


@query("pack_sequences_docs")
def pack_sequences_docs(spark, sf_dir):
    """Token-budget sequence packing (offset-based): global prefix sum of
    token counts, sequence id by integer division."""
    from .operators.textprep import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), 256)


@query("token_budget_corpus")
def token_budget_corpus(spark, sf_dir):
    """Greedy corpus curation under a global token budget: keep the
    longest documents (n_chars DESC, doc_id tie-break) until 10k
    cumulative whitespace tokens (textprep.budget_select — distributed
    two-pass prefix sum, never a single-reducer window)."""
    from .operators.text_analysis import token_count
    from .operators.textprep import budget_select

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", token_count("text").cast("long").alias("n_tokens")
    )
    return budget_select(docs, "n_chars", "n_tokens", "doc_id", 10_000)


@query("agg_string_collect")
def agg_string_collect(spark, sf_dir):
    """Ordered string aggregation (collect_list -> array_sort -> join):
    the listagg/string_agg family, deterministic via the sort. The
    sampled-key filter keeps the aggregated string bounded at any scale."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") % 100 == 0)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_names"),
            F.concat_ws(",", F.array_sort(F.collect_list("c_name")))
            .alias("names_csv"),
        )
    )


@query("join_full_outer")
def join_full_outer(spark, sf_dir):
    """Full-outer join of two periodized per-customer aggregates (early vs
    late orders) — rows surviving from either side, coalesced keys, NULL
    counts preserved. Completes the declared join-type family."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1996-01-01").cast("timestamp")
    early = o.where(F.col("o_orderdate").cast("timestamp") < cutoff) \
        .groupBy("o_custkey").agg(F.count(F.lit(1)).cast("long").alias("n_early"))
    late = o.where(F.col("o_orderdate").cast("timestamp") >= cutoff) \
        .groupBy(F.col("o_custkey").alias("__ck")) \
        .agg(F.count(F.lit(1)).cast("long").alias("n_late"))
    j = early.join(late, early.o_custkey == late.__ck, "full_outer")
    return j.select(
        F.coalesce(early.o_custkey, late.__ck).alias("custkey"),
        "n_early",
        "n_late",
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped analytics, widened family (q4/q6/q10/q12/q14 adaptations to
# the fixture's columns; reference has no analytics surface — SURVEY §2.12)
# ---------------------------------------------------------------------------


@query("q4_order_priority")
def q4_order_priority(spark, sf_dir):
    """Q4 shape: EXISTS semi-join (orders having a slow-shipped lineitem)
    counted by priority."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # Provably-redundant filter propagation (results identical, proved
    # against the oracle): o_orderkey is the orders PK, so the inner
    # join row that keeps an outer-filtered order IS that same order —
    # its o_orderdate lies in the outer [1996, 1997) range, and
    # l_shipdate > o_orderdate + 60d then implies l_shipdate >
    # 1996-01-01 + 60d. Both predicates reach the parquet scans as
    # pushed filters instead of joining the full tables (guide §3.4).
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    sixty = F.expr("INTERVAL 60 DAYS")
    slow = li.where(
        F.col("l_shipdate").cast("timestamp") > lo + sixty
    ).join(
        o.select("o_orderkey", "o_orderdate").where(
            (F.col("o_orderdate").cast("timestamp") >= lo)
            & (F.col("o_orderdate").cast("timestamp") < hi)
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).where(
        F.col("l_shipdate").cast("timestamp")
        > F.col("o_orderdate").cast("timestamp") + sixty
    ).select(F.col("l_orderkey").alias("o_orderkey")).distinct()
    return (
        o.join(slow, "o_orderkey", "left_semi")
        .where(
            (F.col("o_orderdate").cast("timestamp") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate").cast("timestamp") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@query("q6_forecast_revenue")
def q6_forecast_revenue(spark, sf_dir):
    """Q6: single-table filtered revenue sum — the pushdown benchmark.
    Revenue accumulates as exact DECIMAL(38,4), emitted once as DOUBLE."""
    li = _t(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("timestamp")
    return (
        li.where(
            (d >= F.lit("1996-01-01").cast("timestamp"))
            & (d < F.lit("1997-01-01").cast("timestamp"))
            & (_dec(F.col("l_discount"), 4, 2) >= F.lit("0.03").cast("decimal(4,2)"))
            & (_dec(F.col("l_discount"), 4, 2) <= F.lit("0.07").cast("decimal(4,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"), 4, 2))
                .cast("decimal(38,4)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@query("q10_returned_items")
def q10_returned_items(spark, sf_dir):
    """Q10: top-20 customers by returned-item revenue in a quarter —
    join + decimal revenue + TakeOrderedAndProject with key tie-break."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    od = F.col("o_orderdate").cast("timestamp")
    rev = (
        li.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (od >= F.lit("1996-01-01").cast("timestamp"))
                & (od < F.lit("1996-04-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (_dec(F.col("l_extendedprice"))
                 * (F.lit("1.00").cast("decimal(4,2)") - _dec(F.col("l_discount"), 4, 2)))
                .cast("decimal(38,4)")
            ).cast("double").alias("revenue")
        )
    )
    return (
        rev.join(c.select("c_custkey", "c_name", "c_nationkey"),
                 rev.o_custkey == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_nationkey", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query("q12_priority_class")
def q12_priority_class(spark, sf_dir):
    """Q12 shape: join + CASE-bucketed counts (high vs low priority) per
    line status."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_count"),
        )
    )


@query("q14_promo_share")
def q14_promo_share(spark, sf_dir):
    """Q14: promo revenue share — two decimal sums, one double division."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    d = F.col("l_shipdate").cast("timestamp")
    rev = (_dec(F.col("l_extendedprice"))
           * (F.lit("1.00").cast("decimal(4,2)") - _dec(F.col("l_discount"), 4, 2))
           ).cast("decimal(38,4)")
    agg = (
        li.where(
            (d >= F.lit("1996-03-01").cast("timestamp"))
            & (d < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(p.select("p_partkey", "p_type"),
              li.l_partkey == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev)
                  .otherwise(F.lit("0.0000").cast("decimal(38,4)")))
            .cast("double").alias("__promo"),
            F.sum(rev).cast("double").alias("__total"),
        )
    )
    return agg.select(
        (F.lit(100.0) * F.col("__promo") / F.col("__total")).alias("promo_share_pct"),
        F.col("__promo").alias("promo_revenue"),
        F.col("__total").alias("total_revenue"),
    )


@query("window_running_distinct")
def window_running_distinct(spark, sf_dir):
    """Running distinct-user count per event type — the windowed
    COUNT(DISTINCT) Spark lacks natively, decomposed as first-occurrence
    flags + cumulative sum (operators/stats.py:running_distinct)."""
    from .operators.stats import running_distinct

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return running_distinct(
        ev, "event_type", "user_id", ["ts_us", "event_id"]
    ).select("event_type", "event_id", "ts_us", "n_distinct_so_far")


@query("pipeline_retrieval")
def pipeline_retrieval(spark, sf_dir):
    """Composed retrieval pipeline: IVF ANN top-k -> join the document
    store -> emit ranked snippets. Gates the COMPOSITION of ANN +
    dimension join, the serving-side shape of a RAG data pipeline."""
    from .operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    topk = similarity.ivf_topk(
        e, e.where(F.col("vec_id") < 5), k=3, n_cells=8, nprobe=2
    )
    return topk.join(
        docs.select(F.col("doc_id"), F.substring("text", 1, 40).alias("snippet")),
        topk.neighbor_id == F.col("doc_id"),
    ).select("query_id", "rank", "doc_id", "snippet")


@query("contamination_screen")
def contamination_screen(spark, sf_dir):
    """Eval hygiene: 5-gram overlap of the deterministic test split
    against the train split (operators/contamination.py)."""
    from .operators.contamination import contamination_report
    from .operators.sampling import train_val_test_split

    docs = train_val_test_split(_t(spark, sf_dir, "documents"), "doc_id")
    return contamination_report(
        docs.where(F.col("split") == "train"),
        docs.where(F.col("split") == "test"),
        n=5,
    )


@query("dq_audit_orders")
def dq_audit_orders(spark, sf_dir):
    """Data-quality audit report for the orders snapshot: null rates, PK
    duplicates, FK orphans, domain violations — long-format metrics."""
    from .operators.quality_audit import audit_orders

    return audit_orders(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


@query("anomaly_orders_3sigma")
def anomaly_orders_3sigma(spark, sf_dir):
    """Z-score outlier screen at a REAL 3 sigma: orders whose lineitem
    revenue is more than 3 sample stddevs from their status-group mean
    (squared comparison — no sqrt on the row path).

    Scored value: per-order Σ extprice·(1−discount) floored to whole
    CENTS as BIGINT — the decimal sum is exact on both engines and the
    positive-value floor is the same integer in both, so the scored
    value never touches a float (the kmeans fixed-point pattern;
    z-scores are scale-invariant). Cents, not the product's native 1e-4
    units: e4 values reach ~1e10 at sf0.1 and overflow anomaly_flags'
    DECIMAL(12,2) contract (Spark would NULL them silently). Why revenue
    at all: o_totalprice is uniform in the fixture (max |z| ≈ 1.74 at
    every SF — round-10 verdict measured the 3-sigma gate can NEVER fire
    on it), while summed revenue is a varying-length convolution with
    genuine tails: ~12/100/976 outliers at sf0.001/0.01/0.1."""
    from .operators.quality_audit import anomaly_flags

    rev = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.floor(F.sum(_rev_dec()) * 100).cast("long").alias("rev_cents"))
    )
    scored = rev.join(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        "o_orderkey",
    )
    return anomaly_flags(
        scored, ["o_orderstatus"], "rev_cents", "o_orderkey",
    )


@query("corpus_top_bigrams")
def corpus_top_bigrams(spark, sf_dir):
    """Corpus-wide top-20 token bigrams (tokenizer-training stats) —
    reuses the contamination n-gram builder; exact counts, text
    tie-break, TakeOrderedAndProject top-n."""
    from .operators.contamination import token_ngrams

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(token_ngrams(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("bigram"))
        .limit(20)
    )


@query("winsorize_order_prices")
def winsorize_order_prices(spark, sf_dir):
    """Per-status p05/p95 winsorization of order totals — the quantile
    pass broadcast back onto rows, comparisons on identical doubles."""
    from .operators import stats

    return stats.winsorize(
        _t(spark, sf_dir, "orders"), ["o_orderstatus"], "o_totalprice",
        "o_orderkey",
    )


@query("simjoin_exact_jaccard")
def simjoin_exact_jaccard(spark, sf_dir):
    """Exact all-pairs Jaccard >= 0.95 via PPJoin-style prefix filtering
    (lossless, unlike the LSH paths) — operators/simjoin.py."""
    from .operators.simjoin import jaccard_join

    return jaccard_join(_t(spark, sf_dir, "documents"), threshold=(19, 20))


@query("profile_customer")
def profile_customer(spark, sf_dir):
    """Per-column profile of the customer table — nulls + distinct counts
    in one aggregation pass (quality_audit.profile_table)."""
    from .operators.quality_audit import profile_table

    return profile_table(_t(spark, sf_dir, "customer"))


@query("dq_fk_audit")
def dq_fk_audit(spark, sf_dir):
    """Schema-wide referential-integrity audit over the declared FK graph
    — one anti-join orphan count per edge, one lazy job."""
    from .operators.quality_audit import fk_audit
    from .sources.catalog import LogicalFK

    tables = {
        n: _t(spark, sf_dir, n)
        for n in ("region", "nation", "customer", "orders", "lineitem")
    }
    edges = [
        LogicalFK(None, "nation", "region", (("n_regionkey", "r_regionkey"),)),
        LogicalFK(None, "customer", "nation", (("c_nationkey", "n_nationkey"),)),
        LogicalFK(None, "orders", "customer", (("o_custkey", "c_custkey"),)),
        LogicalFK(None, "lineitem", "orders", (("l_orderkey", "o_orderkey"),)),
    ]
    return fk_audit(tables, edges)


@query("multimodal_frames")
def multimodal_frames(spark, sf_dir):
    """1:N frame sampling through the Arrow mapInPandas plumbing (the
    deterministic stand-in slices every 64 bytes, max 4 frames) — frames
    re-decoded to text so the oracle can mirror the byte arithmetic."""
    from .operators import multimodal

    media = multimodal.with_binary_content(_tp(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=4)
    return frames.select(
        "media_id",
        F.col("frame_index").cast("long").alias("frame_index"),
        F.length("frame").cast("long").alias("frame_bytes"),
        F.decode(F.col("frame"), "UTF-8").alias("frame_text"),
    )


@query("multimodal_resize")
def multimodal_resize(spark, sf_dir):
    """Resize plumbing (stand-in truncates/pads to w*h bytes by cycling
    the payload) — output re-decoded for the oracle mirror."""
    from .operators import multimodal

    media = multimodal.with_binary_content(_tp(spark, sf_dir, "documents"))
    out = multimodal.resize_images(media, 8, 8)
    return out.select(
        "media_id",
        F.length("content").cast("long").alias("n_bytes"),
        F.decode(F.col("content"), "UTF-8").alias("resized_text"),
    )


@query("drift_price_distribution")
def drift_price_distribution(spark, sf_dir):
    """Distribution drift (total variation distance, exact-integer sum)
    between early and late order-price snapshots over $50k bins."""
    from .operators import stats

    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    early = o.where(F.col("o_orderdate").cast("timestamp") < cutoff)
    late = o.where(F.col("o_orderdate").cast("timestamp") >= cutoff)
    return stats.distribution_drift(early, late, "o_totalprice", 5_000_000)


@query("text_repetition")
def text_repetition(spark, sf_dir):
    """Gopher-style within-document repetition signals: duplicate-token
    fraction, top-bigram coverage, duplicate-bigram fraction — the
    pre-training boilerplate/spam gate (text_analysis.repetition_metrics)."""
    return text_analysis.repetition_metrics(_t(spark, sf_dir, "documents"))


@query("dup_spans")
def dup_spans(spark, sf_dir):
    """Cross-document duplicated-span fractions via 30-char rolling k-grams
    — the distributed form of exact substring dedup
    (text_analysis.duplicate_spans)."""
    return text_analysis.duplicate_spans(_t(spark, sf_dir, "documents"), k=30)


@query("cms_sketch_tokens")
def cms_sketch_tokens(spark, sf_dir):
    """Count-min sketch grid (4x256) over corpus tokens — bounded-memory
    frequency state: the shuffle carries at most depth*width cells no
    matter the token cardinality (operators/sketch.py)."""
    from .operators import sketch

    toks = dedup.ensure_parallelism(_t(spark, sf_dir, "documents")).select(
        F.explode(T.tokens(F.col("text"))).alias("token")
    )
    return sketch.cms_sketch(toks, "token", depth=4, width=256)


@query("cms_heavy_hitters")
def cms_heavy_hitters(spark, sf_dir):
    """Heavy hitters by count-min estimate: probe the tokens of every 20th
    document against the corpus sketch, top-20 by estimated frequency
    (token tie-break). Estimates are deterministic (frozen hash kernel),
    so the DuckDB oracle replays the grid exactly."""
    from .operators import sketch

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
    probes = (
        docs.where(F.col("doc_id") % 20 == 0)
        .select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .distinct()
    )
    return sketch.cms_topk(toks, probes, "token", k=20, depth=4, width=256)


@query("contamination_bloom")
def contamination_bloom(spark, sf_dir):
    """The contamination screen with the training gram set compressed to a
    broadcastable Bloom filter (operators/bloom.py) — deterministic false
    positives only, train side bounded at num_bits/64 rows. Same split and
    output shape as contamination_screen."""
    from .operators.bloom import bloom_contamination_report
    from .operators.sampling import train_val_test_split

    docs = train_val_test_split(_t(spark, sf_dir, "documents"), "doc_id")
    return bloom_contamination_report(
        docs.where(F.col("split") == "train"),
        docs.where(F.col("split") == "test"),
        n=5,
        num_bits=1 << 16,
        num_hashes=4,
    )


@query("embedding_kmeans")
def embedding_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means over the embeddings corpus (2 iterations,
    8 cells): map-side argmax-cosine assignment + one bounded-collect
    centroid update per iteration (operators/kmeans.py). Deterministic end
    to end, so both iterations are mirrored in the DuckDB oracle."""
    from .operators.kmeans import kmeans_cluster_profile

    return kmeans_cluster_profile(
        _t(spark, sf_dir, "embeddings"), n_clusters=8, iters=2
    )


@query("zorder_orders")
def zorder_orders(spark, sf_dir):
    """Morton (Z-order) curve values for orders on (o_custkey,
    o_totalprice) — the multi-column clustering key behind
    layout.zorder_by; pure integer bit-interleave after one bounded
    min/max pass, mirrored bit-for-bit in the oracle."""
    from .operators import layout

    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo0"),
        F.max(F.col("o_custkey").cast("double")).alias("hi0"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo1"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi1"),
    ).first()
    scaled = [
        layout._scale_expr(F.col("o_custkey"), bounds["lo0"], bounds["hi0"], 16),
        layout._scale_expr(F.col("o_totalprice"), bounds["lo1"], bounds["hi1"], 16),
    ]
    return o.select(
        "o_orderkey", layout.zorder_value(scaled, 16).alias("zval")
    )


@query("dedup_lsh_ingest")
def dedup_lsh_ingest(spark, sf_dir):
    """Incremental near-dup ingest: every 10th document arrives as a new
    batch and screens against the standing corpus's prebuilt LSH band
    index (operators/dedup.py minhash_band_index + minhash_lsh_ingest) —
    signatures are computed for the batch only."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    index = dedup.minhash_band_index(corpus)
    # hash_shingles=False: oracle bit-parity (text-Jaccard DuckDB mirror)
    return dedup.minhash_lsh_ingest(
        index, corpus, new, hash_shingles=False)


@query("sample_weighted_topk")
def sample_weighted_topk(spark, sf_dir):
    """Length-weighted deterministic document sample: 100 docs, inclusion
    probability ~ n_chars (sampling.weighted_sample_topk; hash-rank
    divided by weight, TakeOrderedAndProject)."""
    from .operators.sampling import weighted_sample_topk

    return weighted_sample_topk(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        "n_chars", 100, "doc_id",
    )


@query("remix_lang_equal")
def remix_lang_equal(spark, sf_dir):
    """Language-balanced corpus remix: every language undersampled to the
    smallest language's count, exact and deterministic
    (sampling.remix_equal)."""
    from .operators.sampling import remix_equal

    return remix_equal(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        "lang", "doc_id",
    )


@query("remix_lang_temperature")
def remix_lang_temperature(spark, sf_dir):
    """Temperature-based (T=2) language remix: per-language quota
    proportional to sqrt(count), integer-exact and deterministic
    (sampling.remix_temperature) — upweights low-resource languages
    without flattening to the uniform mix."""
    from .operators.sampling import remix_temperature

    return remix_temperature(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        "lang", "doc_id", total_out=300,
    )


@query("remix_token_equal")
def remix_token_equal(spark, sf_dir):
    """Token-balanced language mix: every language capped at the same
    cumulative token mass (2000 whitespace tokens), docs admitted in
    deterministic hash order (sampling.remix_equal_tokens) — equal doc
    counts are not equal token mass when lengths differ by language."""
    from .operators.sampling import remix_equal_tokens
    from .operators.text_analysis import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").cast("long").alias("n_tokens")
    )
    return remix_equal_tokens(docs, "lang", "n_tokens", "doc_id", 2000)


@query("vocab_build")
def vocab_build(spark, sf_dir):
    """Deterministic corpus vocabulary (textprep.build_vocab): contiguous
    ids by (frequency DESC, token ASC) over the vocabulary-bounded
    distinct-token table."""
    from .operators.textprep import build_vocab

    return build_vocab(dedup.ensure_parallelism(_t(spark, sf_dir, "documents")))


@query("encode_docs")
def encode_docs(spark, sf_dir):
    """Token-id encoding of every document against the corpus vocabulary
    (textprep.encode_documents) — the tokenize-and-encode step before
    sequence packing; ids emitted as CSV for engine-neutral hashing."""
    from .operators.textprep import build_vocab, encode_documents

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    return encode_documents(docs, build_vocab(docs))


@query("quantile_transform_prices")
def quantile_transform_prices(spark, sf_dir):
    """Empirical-CDF normalization of order totals
    (stats.quantile_transform): exact global quantile position per row
    via the distributed prefix-sum rank, cache released eagerly."""
    from .operators import stats

    return stats.quantile_transform(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_totalprice", "o_orderkey",
    )


@query("equidepth_order_prices")
def equidepth_order_prices(spark, sf_dir):
    """Exact equal-frequency decile histogram of order totals
    (stats.equi_depth_histogram): distributed global rank via the
    two-pass prefix sum, no single-reducer global window."""
    from .operators import stats

    return stats.equi_depth_histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey", 10
    )


# ---------------------------------------------------------------------------
# TPC-H extension block (round 4) — the remaining classic decision-support
# shapes, adapted to the available star schema (no partsupp / commitdate /
# comment columns; substitutions documented per query). These exercise the
# plan shapes the first TPC-H batch (q1/q3/q4/q5/q6/q10/q12/q14) did not:
# correlated min/avg subqueries, HAVING against a global aggregate,
# left-outer count distributions, EXISTS/NOT-EXISTS chains, OR-of-range
# predicates, and aggregation-derived semi-join filters.
# ---------------------------------------------------------------------------

_ONE_DEC = "1.00"


def _rev_dec() -> Column:
    """Exact decimal revenue term: extprice * (1 - discount)."""
    return (
        _dec(F.col("l_extendedprice"))
        * (F.lit(_ONE_DEC).cast("decimal(4,2)") - _dec(F.col("l_discount"), 4, 2))
    ).cast("decimal(38,4)")


@query("q2_min_cost_supplier")
def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape (correlated MIN subquery): for each mid-size ECONOMY part,
    the shipper(s) whose account balance equals the minimum over that
    part's shippers. partsupp is absent, so "supplies part" is derived
    from the distinct (l_partkey, l_suppkey) pairs actually shipped.

    Scale: the shipped-pairs distinct is a map-side-combinable aggregate
    over lineitem; supplier is broadcast; the per-part MIN is a tiny
    second aggregate re-joined on the part key (no window needed)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    sp = shipped.join(
        s.select("s_suppkey", "s_name", "s_acctbal"),
        shipped.l_suppkey == F.col("s_suppkey"),
    )
    mn = sp.groupBy("l_partkey").agg(F.min("s_acctbal").alias("__min_bal"))
    return (
        sp.join(mn, "l_partkey")
        .where(F.col("s_acctbal") == F.col("__min_bal"))
        .join(
            p.where((F.col("p_size").between(10, 20)) & (F.col("p_type") == "ECONOMY"))
            .select("p_partkey", "p_name"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


@query("q7_nation_volume")
def q7_nation_volume(spark, sf_dir):
    """Q7: shipping volume between two trading nations by direction and
    ship year. lineitem->supplier gives the exporting nation,
    lineitem->orders->customer the importing one."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    d = F.col("l_shipdate").cast("timestamp")
    supp_n = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.where(
            (d >= F.lit("1996-01-01").cast("timestamp"))
            & (d < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year(d).cast("long").alias("l_year"))
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
    )


@query("q8_market_share")
def q8_market_share(spark, sf_dir):
    """Q8: NATION_2's share of SMALL-part revenue delivered into ASIA per
    order year — two exact decimal sums, one double division."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    od = F.col("o_orderdate").cast("timestamp")
    asia_nations = (
        n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
               n.n_regionkey == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    zero = F.lit("0.0000").cast("decimal(38,4)")
    agg = (
        li.join(p.where(F.col("p_type") == "SMALL").select("p_partkey"),
                li.l_partkey == F.col("p_partkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(
            o.where(
                (od >= F.lit("1996-01-01").cast("timestamp"))
                & (od < F.lit("1998-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey", F.year(od).cast("long").alias("o_year")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("s_nationkey") == 2, _rev_dec()).otherwise(zero))
            .cast("double").alias("nation_revenue"),
            F.sum(_rev_dec()).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "o_year",
        (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
        "nation_revenue",
        "total_revenue",
    )


@query("q9_product_profit")
def q9_product_profit(spark, sf_dir):
    """Q9: profit on parts whose name contains 'e', by supplier nation and
    order year. ps_supplycost is absent: cost is modeled as 60% of the
    part's retail price per unit — the decimal arithmetic stays exact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    od = F.col("o_orderdate").cast("timestamp")
    cost = (
        _dec(F.col("p_retailprice"))
        * F.lit("0.60").cast("decimal(4,2)")
        * _dec(F.col("l_quantity"), 4, 0)
    ).cast("decimal(38,4)")
    amount = (_rev_dec() - cost).cast("decimal(38,4)")
    return (
        li.join(
            p.where(F.col("p_name").contains("e")).select("p_partkey", "p_retailprice"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(s.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.select("o_orderkey", F.year(od).cast("long").alias("o_year")),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query("q11_important_parts")
def q11_important_parts(spark, sf_dir):
    """Q11 shape (HAVING vs a global aggregate): per-part shipped value
    from EUROPE-nation suppliers, keeping parts worth more than 0.1% of
    the total — the fraction threshold is scale-invariant. The scalar
    total is a one-row cross join (broadcast by AQE)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    europe_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    base = li.join(europe_sup, li.l_suppkey == F.col("s_suppkey"), "left_semi")
    per_part = base.groupBy("l_partkey").agg(
        F.sum(_dec(F.col("l_extendedprice")).cast("decimal(38,4)"))
        .cast("double").alias("part_value")
    )
    total = base.agg(
        F.sum(_dec(F.col("l_extendedprice")).cast("decimal(38,4)"))
        .cast("double").alias("__total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("__total") * F.lit(0.001))
        .select("l_partkey", "part_value")
    )


@query("q13_customer_distribution")
def q13_customer_distribution(spark, sf_dir):
    """Q13: distribution of per-customer order counts via a left outer
    join (customers with zero orders land in the c_count=0 bucket). The
    comment-pattern exclusion is modeled as dropping '5-LOW' orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.select("c_custkey")
        .join(
            o.where(F.col("o_orderpriority") != "5-LOW")
            .select("o_custkey", "o_orderkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query("q15_top_supplier")
def q15_top_supplier(spark, sf_dir):
    """Q15: supplier(s) achieving the maximum quarterly revenue — the
    revenue view joined against its own scalar MAX."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    d = F.col("l_shipdate").cast("timestamp")
    rev = (
        li.where(
            (d >= F.lit("1996-01-01").cast("timestamp"))
            & (d < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_dec()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(s.select("s_suppkey", "s_name"),
              rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query("q16_supplier_cnt")
def q16_supplier_cnt(spark, sf_dir):
    """Q16: how many distinct suppliers can ship each (brand, type, size)
    combo, excluding one brand and complaint suppliers (modeled as
    negative account balance); supply relation derived from lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(bad, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            p.where(
                (F.col("p_brand") != "Brand#5")
                & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
            ).select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query("q17_small_qty_revenue")
def q17_small_qty_revenue(spark, sf_dir):
    """Q17 (correlated AVG subquery): revenue lost to small-quantity
    Brand#3 orders. The per-part average is sum/count on exact integral
    quantities, so the 0.5*avg comparison is bit-identical cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(_dec(F.col("l_quantity"), 12, 0)).cast("double").alias("__qty_sum"),
        F.count(F.lit(1)).cast("double").alias("__qty_cnt"),
    )
    return (
        li.join(p.where(F.col("p_brand") == "Brand#3").select("p_partkey"),
                li.l_partkey == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("__pk"))
        .where(
            F.col("l_quantity")
            < F.lit(0.5) * (F.col("__qty_sum") / F.col("__qty_cnt"))
        )
        .agg(
            (F.sum(_dec(F.col("l_extendedprice")).cast("decimal(38,4)"))
             .cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@query("q18_large_orders")
def q18_large_orders(spark, sf_dir):
    """Q18: customers with orders whose line quantities sum past 300 —
    the HAVING-subquery IN filter as an aggregate + inner join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"), 12, 0)).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c.select("c_custkey", "c_name"), o.o_custkey == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "o_totalprice",
            "total_qty",
        )
    )


@query("q19_discounted_revenue")
def q19_discounted_revenue(spark, sf_dir):
    """Q19: OR-of-range-predicate revenue — three disjunctive
    brand/size/quantity envelopes over a part join, one decimal sum."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(
        p.select("p_partkey", "p_brand", "p_size"),
        li.l_partkey == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & q.between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.where(cond).agg(
        F.sum(_rev_dec()).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query("q20_promo_suppliers")
def q20_promo_suppliers(spark, sf_dir):
    """Q20 shape (nested-IN semi-join chain): healthy-balance suppliers
    who shipped more than half of some ECONOMY part's lifetime quantity
    during 1996 — the availqty comparison re-derived from shipments."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    d = F.col("l_shipdate").cast("timestamp")
    in96 = (
        (d >= F.lit("1996-01-01").cast("timestamp"))
        & (d < F.lit("1997-01-01").cast("timestamp"))
    )
    zero = F.lit("0").cast("decimal(12,0)")
    per = (
        li.join(
            p.where(F.col("p_type") == "ECONOMY").select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in96, _dec(F.col("l_quantity"), 12, 0)).otherwise(zero))
            .cast("double").alias("__q96"),
            F.sum(_dec(F.col("l_quantity"), 12, 0)).cast("double").alias("__qall"),
        )
        .where(F.col("__q96") * F.lit(2.0) > F.col("__qall"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.where(F.col("s_acctbal") > 0)
        .join(per, s.s_suppkey == per.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query("q21_waiting_suppliers")
def q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape (EXISTS + NOT EXISTS): ASIA suppliers who were the sole
    returner on a multi-supplier finished order — a semi-join on
    same-order-different-supplier and an anti-join on
    same-order-different-supplier-also-returned."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    asia_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    fo = li.join(
        o.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    l1 = fo.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = fo.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    ).distinct()
    l3 = (
        fo.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3"))
        .distinct()
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("__ok2"))
            & (F.col("l_suppkey") != F.col("__sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3")),
            "left_anti",
        )
    )
    return (
        waited.join(asia_sup, waited.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@query("q22_idle_customers")
def q22_idle_customers(spark, sf_dir):
    """Q22 shape (scalar-AVG filter + anti-join): rich customers with no
    recent orders, summarized by nation. The positive-balance average is
    an exact decimal sum over a double count — one division each side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec(F.col("c_acctbal")).cast("decimal(38,4)")).cast("double")
             / F.count(F.lit(1)).cast("double")).alias("__avg_bal")
        )
    )
    recent = (
        o.where(
            F.col("o_orderdate").cast("timestamp")
            >= F.lit("1999-01-01").cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(_dec(F.col("c_acctbal")).cast("decimal(38,4)"))
            .cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 pipeline operators: lexical retrieval, sequence models, record
# linkage, and an iterative graph primitive beyond connected components.
# ---------------------------------------------------------------------------


@query("bm25_docs")
def bm25_docs(spark, sf_dir):
    """BM25 top-50 documents for a fixed bag of query terms
    (retrieval.bm25_scores) — the sparse half of a hybrid RAG stack;
    all-integer TF/IDF rationals + 2^20 fixed-point score accumulation
    keep the ranking bit-identical cross-engine."""
    from .operators.retrieval import bm25_scores

    return bm25_scores(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents")),
        ["spark", "window", "hash"],
        top_k=50,
    )


@query("bigram_lm_docs")
def bigram_lm_docs(spark, sf_dir):
    """Corpus bigram language-model count table with exact conditional
    probabilities (text_analysis.bigram_lm)."""
    return text_analysis.bigram_lm(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    )


@query("markov_event_transitions")
def markov_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (sequences.markov_transitions), ordered by the engine's
    (timestamp, event_id) tie-break rule."""
    from .operators.sequences import markov_transitions

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return markov_transitions(ev)


@query("linkage_customer_supplier")
def linkage_customer_supplier(spark, sf_dir):
    """Blocked record linkage (linkage.blocked_levenshtein_link):
    candidates blocked on the trailing-digit key, verified by exact
    Levenshtein distance — the Splink/Dedupe blocking pattern as an
    equi-join."""
    from .operators.linkage import blocked_levenshtein_link

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return blocked_levenshtein_link(
        c, s,
        F.expr("right(c_name, 4)"), F.expr("right(s_name, 4)"),
        "c_name", "s_name", max_distance=5,
    ).select("c_custkey", "s_suppkey", "c_name", "s_name", "block", "distance")


@query("pagerank_trade")
def pagerank_trade(spark, sf_dir):
    """Integer-scaled weighted PageRank (graph.pagerank, 3 iterations,
    damping 0.85) over the customer-nation -> supplier-nation trade
    graph — every iteration an exact int64 join + sum, bit-identical
    under any partitioning."""
    from .operators.graph import nation_trade_edges, pagerank

    edges = nation_trade_edges(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
    )
    pr = pagerank(edges, iterations=3)
    n = _t(spark, sf_dir, "nation")
    return pr.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        pr.node == F.col("n_nationkey"),
    ).select(F.col("node").alias("nationkey"), "n_name", "rank_fp", "rank")


@query("graph_triangles")
def graph_triangles(spark, sf_dir):
    """Per-nation triangle counts + local clustering coefficient over the
    trade graph (graph.triangle_stats) — degree-oriented wedge
    enumeration (Suri & Vassilvitskii), exact integer counts, one IEEE
    division at output."""
    from .operators.graph import nation_trade_edges, triangle_stats

    edges = nation_trade_edges(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
    )
    # DuckDB's least()/greatest() promote INTEGER keys to BIGINT; match it.
    return triangle_stats(edges).withColumn(
        "node", F.col("node").cast("long")
    ).select("node", "degree", "tri_count", "lcc")


@query("anomaly_mad_orders")
def anomaly_mad_orders(spark, sf_dir):
    """Robust MAD outlier report per order status
    (stats.mad_outliers) — the breakdown-resistant complement of the
    3-sigma screen; all medians in exact integer cents."""
    from .operators import stats

    return stats.mad_outliers(
        _t(spark, sf_dir, "orders"),
        ["o_orderstatus"], "o_totalprice", "o_orderkey", c=3,
    )


@query("json_props_profile")
def json_props_profile(spark, sf_dir):
    """Typed flatten of the events JSON props column via native
    from_json (JVM JsonToStructs — no Python), profiled per event type.
    Exact integer aggregation; one IEEE division for the mean."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").alias("__p"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("__p.k")).cast("long").alias("sum_k"),
        F.min(F.col("__p.k")).cast("long").alias("min_k"),
        F.max(F.col("__p.k")).cast("long").alias("max_k"),
    ).select(
        "event_type", "n_events", "sum_k", "min_k", "max_k",
        (F.col("sum_k").cast("double") / F.col("n_events").cast("double"))
        .alias("avg_k"),
    )


@query("window_rank_family")
def window_rank_family(spark, sf_dir):
    """The full SQL rank-function family over one per-status price sort:
    rank / dense_rank / percent_rank / cume_dist / ntile(4) — unique
    (price, orderkey) ordering makes every one engine-deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey", "o_orderstatus",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query("event_paths_top")
def event_paths_top(spark, sf_dir):
    """Top-25 three-step event paths (sequences.top_paths): per-user
    (ts, event_id)-ordered lag trigrams, global counts, tie-broken
    TakeOrderedAndProject top-k."""
    from .operators.sequences import top_paths

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return top_paths(ev, n=3, k=25)


@query("drift_ks_status")
def drift_ks_status(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov drift (stats.ks_statistic)
    between finished and open orders' price distributions — unbinned
    supremum distance via integer cross-products and the distributed
    prefix-sum rank."""
    from .operators import stats

    o = _t(spark, sf_dir, "orders")
    return stats.ks_statistic(
        o.where(F.col("o_orderstatus") == "F"),
        o.where(F.col("o_orderstatus") == "O"),
        "o_totalprice",
    )


@query("window_value_family")
def window_value_family(spark, sf_dir):
    """first_value / last_value / nth_value over explicit frames — the
    remaining SQL window-value functions, under a unique (date, key)
    order so every one is engine-deterministic."""
    o = _t(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    w = Window.partitionBy("o_custkey").orderBy(
        F.unix_micros(ts).asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first_value(F.col("o_orderkey")).over(w_full).cast("long")
        .alias("first_order"),
        F.last_value(F.col("o_orderkey")).over(w_full).cast("long")
        .alias("last_order"),
        F.nth_value(F.col("o_orderkey"), 2).over(w_full).cast("long")
        .alias("second_order"),
        F.first_value(_dec(F.col("o_totalprice")).cast("double"))
        .over(w_full).alias("first_price"),
    )


@query("concentration_segments")
def concentration_segments(spark, sf_dir):
    """Per-nation market-segment concentration: Herfindahl index and
    Gini impurity from EXACT integer category counts — sum(n_i^2)/n^2
    needs no floating-point accumulation, just one IEEE division."""
    c = _t(spark, sf_dir, "customer")
    per_seg = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return per_seg.groupBy("c_nationkey").agg(
        F.sum("__n").cast("long").alias("n_customers"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.col("__n") * F.col("__n")).cast("long").alias("__s2"),
        F.max("__n").cast("long").alias("__maxn"),
    ).select(
        "c_nationkey", "n_customers", "n_segments",
        (F.col("__s2").cast("double")
         / (F.col("n_customers") * F.col("n_customers")).cast("double"))
        .alias("hhi"),
        ((F.col("n_customers") * F.col("n_customers") - F.col("__s2"))
         .cast("double")
         / (F.col("n_customers") * F.col("n_customers")).cast("double"))
        .alias("gini_impurity"),
        (F.col("__maxn").cast("double") / F.col("n_customers").cast("double"))
        .alias("top_share"),
    )


@query("agg_mode_disc_percentiles")
def agg_mode_disc_percentiles(spark, sf_dir):
    """Per-status modal order priority (deterministic count-desc /
    value-asc tie-break — engine mode() functions pick arbitrarily on
    ties) and discrete quartiles of the order price (percentile_disc
    semantics via an explicit rank, value at ceil(p*n))."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wm = Window.partitionBy("o_orderstatus").orderBy(
        F.col("__n").desc(), F.col("o_orderpriority").asc()
    )
    mode = (
        counts.withColumn("__rn", F.row_number().over(wm))
        .where(F.col("__rn") == 1)
        .select("o_orderstatus",
                F.col("o_orderpriority").alias("mode_priority"))
    )
    wp = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    wc = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus", "o_totalprice",
        F.row_number().over(wp).alias("__rn"),
        F.count(F.lit(1)).over(wc).alias("__cnt"),
    )

    def disc(p: float):
        return F.max(
            F.when(
                F.col("__rn") == F.ceil(F.lit(p) * F.col("__cnt")),
                F.col("o_totalprice"),
            )
        )

    pct = ranked.groupBy("o_orderstatus").agg(
        F.max("__cnt").cast("long").alias("n_orders"),
        disc(0.25).alias("p25_disc"),
        disc(0.5).alias("p50_disc"),
        disc(0.75).alias("p75_disc"),
    )
    return pct.join(mode, "o_orderstatus").select(
        "o_orderstatus", "n_orders", "mode_priority",
        "p25_disc", "p50_disc", "p75_disc",
    )


@query("unpivot_lineitem_metrics")
def unpivot_lineitem_metrics(spark, sf_dir):
    """Native UNPIVOT (melt) of the four lineitem measures into long
    format — plans as one Expand over a single scan, not four unioned
    scans — then a per-metric profile."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    long = li.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric", "value",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        .alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query("assoc_brand_pairs")
def assoc_brand_pairs(spark, sf_dir):
    """Market-basket association rules (assoc.association_rules): top-100
    co-ordered part-brand pairs with support / confidence / lift —
    A-Priori item prune before the basket self-join."""
    from .operators.assoc import association_rules

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(
        p, li.l_partkey == p.p_partkey
    ).select("l_orderkey", "p_brand")
    return association_rules(
        baskets, "l_orderkey", "p_brand", min_item_support=2, top_k=100
    )


@query("ts_daily_interpolate")
def ts_daily_interpolate(spark, sf_dir):
    """Per-user daily resample with linear gap interpolation
    (timeseries.resample_interpolate_daily) — irregular events become a
    fixed-cadence series, gaps filled between observed neighbors."""
    from .operators.timeseries import resample_interpolate_daily

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return resample_interpolate_daily(ev, "user_id", "ts", "value")


@query("semantic_dedup_embeddings")
def semantic_dedup_embeddings(spark, sf_dir):
    """SemDeDup semantic deduplication (kmeans.semantic_dedup): k-means
    cells bound the quadratic cosine comparison; lowest-id survivor per
    near-duplicate pair. Same trained quantizer as embedding_kmeans."""
    from .operators.kmeans import semantic_dedup

    e = dedup.ensure_parallelism(_t(spark, sf_dir, "embeddings"))
    return semantic_dedup(e, n_clusters=8, iters=2, threshold=0.9)


@query("doc_surprisal_corpus")
def doc_surprisal_corpus(spark, sf_dir):
    """Integer-exact LM surprisal scoring (text_analysis.doc_surprisal):
    per-doc mean bigram cost in whole bits against the corpus bigram
    table — the deterministic CCNet perplexity-filter stand-in."""
    return text_analysis.doc_surprisal(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    )


@query("bpe_train_corpus")
def bpe_train_corpus(spark, sf_dir):
    """BPE tokenizer training (textprep.bpe_train): 8 merge iterations
    over the corpus word-frequency table — one corpus scan, then
    model-sized iterations, one (pair, count) row to the driver each."""
    from .operators.textprep import bpe_train

    return bpe_train(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents")),
        n_merges=8,
    )


@query("bpe_encode_docs")
def bpe_encode_docs(spark, sf_dir):
    """Train 8 BPE merges on the corpus, then segment every document
    with them (textprep.bpe_segment) — the trained-tokenizer encode
    pass as one codegen replace chain per token."""
    from .operators.textprep import bpe_segment, bpe_train

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    merges = [tuple(r) for r in bpe_train(docs, n_merges=8).collect()]
    return bpe_segment(docs, merges)


@query("byte_bpe_train_corpus")
def byte_bpe_train_corpus(spark, sf_dir):
    """Byte-level BPE training (textprep.byte_bpe_train — the GPT-2
    byte encoder): pre-token frequency table via the RE2/Java-identical
    GPT-2 regex, UTF-8 bytes remapped through the printable-symbol
    bijection, then the same deterministic merge loop as bpe_train —
    one corpus scan, model-sized iterations."""
    from .operators.textprep import byte_bpe_train

    return byte_bpe_train(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents")),
        n_merges=8,
    )


@query("byte_bpe_encode_docs")
def byte_bpe_encode_docs(spark, sf_dir):
    """Train 8 byte-level merges, then encode every document
    (textprep.byte_bpe_segment): per-pre-token codegen replace chain,
    one per-document reassembly shuffle — what a training-data pipeline
    actually meters tokens with."""
    from .operators.textprep import byte_bpe_segment, byte_bpe_train

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    merges = [tuple(r) for r in byte_bpe_train(docs, n_merges=8).collect()]
    return byte_bpe_segment(docs, merges)


@query("byte_bpe_roundtrip_docs")
def byte_bpe_roundtrip_docs(spark, sf_dir):
    """Byte-level BPE losslessness, driver-checked: encode every
    document with 8 trained merges, decode the pieces back
    (textprep.byte_bpe_decode), and return (doc_id, text). The oracle
    is the ORIGINAL documents table — a value-hash match proves
    decode(encode(x)) == x corpus-wide in the driver's own compare."""
    from .operators.textprep import (
        byte_bpe_decode,
        byte_bpe_segment,
        byte_bpe_train,
    )

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    merges = [tuple(r) for r in byte_bpe_train(docs, n_merges=8).collect()]
    return byte_bpe_decode(byte_bpe_segment(docs, merges))


@query("unigram_train_corpus")
def unigram_train_corpus(spark, sf_dir):
    """Unigram-LM tokenizer training (textprep.unigram_train — the
    SentencePiece unigram model, Kudo 2018): seed substring vocabulary,
    integer-bit costs, two hard-EM Viterbi iterations over the
    word-frequency table. The oracle replays every EM iteration as a
    recursive-CTE Viterbi DP and must agree on the final vocabulary,
    counts, costs, and ranks exactly."""
    from .operators.textprep import unigram_train

    return unigram_train(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents")),
        n_multi=120, n_iters=2,
    )


@query("unigram_encode_docs")
def unigram_encode_docs(spark, sf_dir):
    """Train the unigram model on the corpus, then Viterbi-segment
    every document with it (textprep.unigram_segment) — the
    trained-tokenizer encode pass, one DP per distinct word joined
    back onto the positional token explode."""
    from .operators.textprep import unigram_segment, unigram_train

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    vocab = [tuple(r) for r in
             unigram_train(docs, n_multi=120, n_iters=2).collect()]
    return unigram_segment(docs, vocab)


@query("scrub_dup_spans")
def scrub_dup_spans(spark, sf_dir):
    """Exact-substring dedup scrub (textprep.scrub_duplicate_spans):
    documents rewritten with cross-document duplicated 8-token spans
    removed — the corpus-cleaning counterpart of dup_spans."""
    from .operators.textprep import scrub_duplicate_spans

    return scrub_duplicate_spans(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents")),
        k=8, min_docs=2,
    )


@query("gdpr_cascade_delete")
def gdpr_cascade_delete(spark, sf_dir):
    """Right-to-erasure audit (plans/deletion.py): delete negative-balance
    customers, cascade through orders -> lineitem on the FK graph, and
    emit the per-table compliance report. Dual of FK subsetting — same
    semi-join machinery, negated seed predicate."""
    from .plans.deletion import deletion_audit

    dfs = {n: _t(spark, sf_dir, n) for n in ["customer", "orders", "lineitem"]}
    return deletion_audit(dfs, _tpch_catalog(), {"customer": "c_acctbal < 0"})


@query("rfm_customer_segments")
def rfm_customer_segments(spark, sf_dir):
    """RFM segmentation (stats.rfm_segments): per-customer recency /
    frequency / monetary quartile scores via the distributed-rank
    bucketer — three classic ntile() global sorts replaced by the
    two-pass prefix-sum rank."""
    from .operators.stats import rfm_segments

    return rfm_segments(_t(spark, sf_dir, "orders"))


@query("privacy_k_anonymity")
def privacy_k_anonymity(spark, sf_dir):
    """k-anonymity audit (operators/privacy.py) of the customer table
    under the (nation, market segment) quasi-identifier — the
    re-identification guarantee an anonymized release actually achieves."""
    from .operators.privacy import k_anonymity

    return k_anonymity(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"],
        k_threshold=5,
    )


@query("privacy_dp_counts")
def privacy_dp_counts(spark, sf_dir):
    """eps-DP noisy release of customer counts by (nation, segment)
    (operators/privacy.dp_noisy_counts) — discrete-Laplace noise drawn
    deterministically from the stable hash of the seeded group key, so
    the release is reproducible and exactly oracle-checkable."""
    from .operators.privacy import dp_noisy_counts

    return dp_noisy_counts(
        _t(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        eps=0.5,
        seed="release-1",
    )


@query("anon_generalize_k")
def anon_generalize_k(spark, sf_dir):
    """Samarati-style minimal generalization (privacy.generalize_to_k):
    customer quasi-identifiers coarsened up their ladders to the LOWEST
    level achieving 5-anonymity — the release-side transform the
    k-anonymity audit measures."""
    from .operators.privacy import CUSTOMER_QI_LADDER, generalize_to_k

    return generalize_to_k(
        _t(spark, sf_dir, "customer"), "c_custkey", CUSTOMER_QI_LADDER, k=5
    )


@query("privacy_l_diversity")
def privacy_l_diversity(spark, sf_dir):
    """l-diversity audit (operators/privacy.py): distinct order-priority
    values per (nation, segment) customer group via the orders join —
    k-anonymity's homogeneity blind spot, measured."""
    from .operators.privacy import l_diversity

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    joined = c.join(o.select("o_custkey", "o_orderpriority"),
                    c.c_custkey == F.col("o_custkey"))
    return l_diversity(
        joined, ["c_nationkey", "c_mktsegment"], "o_orderpriority",
        l_threshold=3,
    )


@query("dsir_select_docs")
def dsir_select_docs(spark, sf_dir):
    """DSIR data selection (operators/selection.py, Xie et al. 2023):
    hashed unigram+bigram bucket counts on the English subcorpus (the
    target) vs the whole pool, per-bucket log-likelihood ratios in exact
    integer bits, per-document sums, top-60 keep set. The classic
    'select web text that looks like the curated corpus' pass."""
    from .operators.selection import dsir_select

    d = _tp(spark, sf_dir, "documents")
    return dsir_select(
        d, d.where(F.col("lang") == "en"), k=60, num_buckets=8192
    )


@query("quality_nb_classifier")
def quality_nb_classifier(spark, sf_dir):
    """Binary Naive Bayes curated-vs-rest screen (selection.nb_classify):
    trained on the ~3/4 hash-split seed with the fastText-quality-
    classifier label shape (target = the curated subcorpus, other =
    everything else), scoring the held-out quarter with exact
    integer-bit posteriors and a deterministic argmin. NOTE: the
    fixture's lang column is nearly independent of its shared 31-token
    vocabulary (only the/a skew en-ward), so held-out accuracy sits
    near chance BY CONSTRUCTION — this gate pins the distributed
    mechanics bit-for-bit; the learning behavior is proven on crafted
    separable corpora in tests/test_selection.py."""
    from .functions.hashing import stable_hash
    from .operators.selection import nb_classify

    d = _tp(spark, sf_dir, "documents").withColumn(
        "cls_label",
        F.when(F.col("lang") == "en", F.lit("target")).otherwise(
            F.lit("other")),
    )
    bucket = F.pmod(
        stable_hash(F.concat(F.col("doc_id").cast("string"),
                             F.lit("__nbsplit|"))),
        F.lit(4),
    )
    return nb_classify(
        d.where(bucket != 0), d.where(bucket == 0), label_col="cls_label"
    )


@query("embedding_random_projection")
def embedding_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss sign projection 64 -> 16 dims
    (similarity.random_projection): data-independent hash-derived sign
    matrix, exact 2^-24 fixed-point integer outputs, one map-only pass.
    The array output is scalarized to 16 named columns for the compare
    (house rule: no list columns in oracle-gated results); Catalyst's
    SimplifyExtractValueOps folds element_at(array(...), lit) back to
    the j-th sum, so nothing is computed twice."""
    e = _t(spark, sf_dir, "embeddings")
    p = similarity.random_projection(e, in_dim=64, out_dim=16)
    return p.select(
        "vec_id",
        *[F.element_at(F.col("projected"), j + 1).alias(f"p{j:02d}")
          for j in range(16)],
    )


@query("corpus_epoch_shuffle")
def corpus_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch-1 training shuffle of the corpus into 4 equal
    contiguous shards (sampling.epoch_shuffle): reproducible global
    positions from the distributed prefix-sum rank over the per-epoch
    hash order — no single-reducer sort, no RNG."""
    from .operators.sampling import epoch_shuffle

    return epoch_shuffle(
        _tp(spark, sf_dir, "documents"), n_shards=4, epoch=1
    )


@query("pmi_collocations")
def pmi_collocations(spark, sf_dir):
    """Top-50 PMI collocations over the corpus
    (text_analysis.pmi_collocations): integer-bit pointwise mutual
    information with min-count pruning — vocabulary-bounded count
    tables, TakeOrderedAndProject top-k."""
    return text_analysis.pmi_collocations(
        _tp(spark, sf_dir, "documents"), min_count=5, k=50
    )


@query("readability_docs")
def readability_docs(spark, sf_dir):
    """Flesch reading-ease features per document
    (text_analysis.readability): exact in-row word/sentence/syllable
    counts, one literal-double formula — a map-only quality signal."""
    return text_analysis.readability(_t(spark, sf_dir, "documents"))


@query("retrieval_mmr")
def retrieval_mmr(spark, sf_dir):
    """MMR-diversified top-8 for query vector 0 over a 20-candidate
    pool (retrieval.mmr_rerank): exact int64 fixed-point relevance and
    pairwise similarity, greedy diversification on the bounded
    candidate matrix (the BPE-style driver loop), lambda = 0.7."""
    from .operators.retrieval import mmr_rerank

    return mmr_rerank(
        _t(spark, sf_dir, "embeddings"), query_id=0,
        n_candidates=20, select_k=8, lam_tenths=7,
    )


@query("corpus_diff_versions")
def corpus_diff_versions(spark, sf_dir):
    """Snapshot version delta (quality_audit.corpus_diff): old = the
    corpus, new = a deterministic release mutation (doc_id%10==0
    dropped, %10==1 text-bumped, %10==2 re-keyed as fresh ids) — the
    added/removed/changed audit a dataset release runs before
    publishing. Hash-only full outer join; delta-sized output."""
    from .operators.quality_audit import corpus_diff

    old = _tp(spark, sf_dir, "documents")
    kept = old.where(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 1,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"),
    )
    added = old.where(F.col("doc_id") % 10 == 2).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return corpus_diff(old, kept.unionByName(added))


@query("bm25_indexed")
def bm25_indexed(spark, sf_dir):
    """BM25 served from the prebuilt inverted index
    (retrieval.build_term_index -> bm25_from_index): the index-once /
    query-many production split; query cost is the postings of the
    query's terms, pushed down as a term filter. Output-identical to
    the direct bm25_scores path (tested), same integer rationals."""
    from .operators.retrieval import bm25_from_index, build_term_index

    idx = build_term_index(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    )
    return bm25_from_index(idx, ["merge", "stream", "vector"], top_k=40)


@query("ivf_cell_stats")
def ivf_cell_stats(spark, sf_dir):
    """IVF index health report (similarity.ivf_cell_stats): per-cell
    occupancy + load factor over the 8-cell coarse quantizer, empty
    cells included — the balance diagnostic that schedules quantizer
    re-training."""
    return similarity.ivf_cell_stats(
        _t(spark, sf_dir, "embeddings"), n_cells=8
    )


@query("release_manifest_versions")
def release_manifest_versions(spark, sf_dir):
    """One-row release certificate (quality_audit.release_manifest) for
    the same deterministic v2 mutation as corpus_diff_versions: both
    snapshots' counts + checksums and the added/removed/changed/
    unchanged breakdown — the sign-off record a dataset release keeps."""
    from .operators.quality_audit import release_manifest

    old = _tp(spark, sf_dir, "documents")
    kept = old.where(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 1,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"),
    )
    added = old.where(F.col("doc_id") % 10 == 2).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return release_manifest(
        old.select("doc_id", "text"), kept.unionByName(added)
    )


@query("bpe_fertility_langs")
def bpe_fertility_langs(spark, sf_dir):
    """Tokenizer QA scorecard: fertility (pieces per word) and
    compression (chars per piece) of the corpus-trained 8-merge BPE,
    per language — the standard multilingual-tokenizer audit (a lang
    whose fertility is 2x pays 2x the sequence length for the same
    text). Composes bpe_train -> bpe_segment -> one aggregation."""
    from .operators.textprep import bpe_segment, bpe_train

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    merges = [tuple(r) for r in bpe_train(docs, n_merges=8).collect()]
    seg = bpe_segment(docs, merges).select("doc_id", "n_pieces")
    base = docs.select(
        "doc_id", "lang",
        F.size(T.tokens(F.col("text"))).cast("long").alias("__w"),
        F.length("text").cast("long").alias("__c"),
    )
    agg = (
        base.join(seg, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__w").cast("long").alias("total_words"),
            F.sum("n_pieces").cast("long").alias("total_pieces"),
            F.sum("__c").cast("long").alias("total_chars"),
        )
    )
    return agg.select(
        "*",
        F.when(F.col("total_words") > 0,
               F.col("total_pieces").cast("double")
               / F.col("total_words").cast("double"))
        .alias("pieces_per_word"),
        F.when(F.col("total_pieces") > 0,
               F.col("total_chars").cast("double")
               / F.col("total_pieces").cast("double"))
        .alias("chars_per_piece"),
    )


@query("byte_bpe_fertility_langs")
def byte_bpe_fertility_langs(spark, sf_dir):
    """Byte-level tokenizer QA scorecard: fertility (pieces per
    pre-token) and compression (UTF-8 BYTES per piece — bytes, not
    chars, are the byte-level tokenizer's native cost unit) of the
    corpus-trained 8-merge byte-level BPE, per language — the GPT-2-
    family counterpart of ``bpe_fertility_langs``. Composes
    byte_bpe_train -> byte_bpe_segment -> one aggregation; every ratio
    is a single IEEE division of exact integer sums (float order
    rule)."""
    from .operators.textprep import (byte_bpe_segment, byte_bpe_train,
                                     byte_pretokens)

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    merges = [tuple(r) for r in byte_bpe_train(docs, n_merges=8).collect()]
    seg = byte_bpe_segment(docs, merges).select("doc_id", "n_pieces")
    base = docs.select(
        "doc_id", "lang",
        F.size(byte_pretokens(F.col("text"))).cast("long").alias("__w"),
        F.octet_length("text").cast("long").alias("__b"),
    )
    agg = (
        base.join(seg, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__w").cast("long").alias("total_pretokens"),
            F.sum("n_pieces").cast("long").alias("total_pieces"),
            F.sum("__b").cast("long").alias("total_bytes"),
        )
    )
    return agg.select(
        "*",
        F.when(F.col("total_pretokens") > 0,
               F.col("total_pieces").cast("double")
               / F.col("total_pretokens").cast("double"))
        .alias("pieces_per_pretoken"),
        F.when(F.col("total_pieces") > 0,
               F.col("total_bytes").cast("double")
               / F.col("total_pieces").cast("double"))
        .alias("bytes_per_piece"),
    )


@query("pipeline_release_corpus")
def pipeline_release_corpus(spark, sf_dir):
    """The canonical pre-training RELEASE composite: Gopher quality gate
    -> leakage-safe grouped split by source (near-dups can't straddle
    splits) -> 5-gram decontamination of the TRAIN split against the
    released TEST split (train docs sharing >=20% of their distinct
    grams with the test corpus are dropped, the standard eval-hygiene
    guard run in the train->test direction). Output: the released
    assignment (doc_id, source, split). Composes three oracle-gated
    operators; the driver hash gates the whole pipeline.

    ``min_stopwords=1`` is pinned on BOTH engines: the synthetic fixture
    corpus carries at most ONE of the 8 English Gopher stop words per
    doc, so the paper default of 2 keeps zero documents at every fixture
    scale and the gate would prove only that both engines emit an empty
    table (round-10 verdict). With 1, ~180 of 500 docs survive at sf0.01
    and every downstream stage processes real rows."""
    from .operators import text_analysis
    from .operators.contamination import contamination_report
    from .operators.sampling import grouped_split

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    kept = (text_analysis.gopher_quality_flags(docs, min_stopwords=1)
            .where(F.col("keep")).select("doc_id"))
    base = docs.join(kept, "doc_id", "left_semi")
    # r12: the split assignment feeds FOUR subtrees (test corpus, train
    # screen, and the released anti-join) — lazy, each re-ran the Gopher
    # quality fold and the semi join over the full corpus (16 parquet
    # scans in the declared plan). Materialize it once.
    split = grouped_split(
        base.select("doc_id", "source", "text"), "source"
    ).localCheckpoint(eager=True)
    # contamination_report(train=..., test=...) scores its SECOND arg's
    # docs against the first's corpus: here the test split is the
    # reference corpus and the train docs are the ones screened/dropped.
    flagged = (contamination_report(
        split.where(F.col("split") == "test"),
        split.where(F.col("split") == "train"), n=5)
        .where(F.col("flagged")).select("doc_id"))
    released = split.join(flagged, "doc_id", "left_anti")
    return released.select("doc_id", "source", "split")


@query("corpus_scorecard_langs")
def corpus_scorecard_langs(spark, sf_dir):
    """Per-language curation dashboard: Gopher keep rate, token volume,
    syllable density, and LM surprisal — the one-glance scorecard that
    decides which language slices need re-filtering before a training
    run. Every ratio is a single IEEE division of exact integer sums
    (never an average of per-doc doubles — float order rule)."""
    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    gf = text_analysis.gopher_quality_flags(docs).select(
        "doc_id", "n_words", "keep"
    )
    rd = text_analysis.readability(docs).select("doc_id", "n_syllables")
    sp = text_analysis.doc_surprisal(docs).select(
        "doc_id", "n_bigrams", "total_bits"
    )
    joined = (
        docs.select("doc_id", "lang")
        .join(gf, "doc_id").join(rd, "doc_id").join(sp, "doc_id")
    )
    agg = joined.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_syllables").cast("long").alias("total_syllables"),
        F.sum("n_bigrams").cast("long").alias("total_bigrams"),
        F.sum("total_bits").cast("long").alias("total_bits"),
    )
    return agg.select(
        "*",
        (F.col("n_keep").cast("double") / F.col("n_docs").cast("double"))
        .alias("keep_rate"),
        F.when(F.col("total_words") > 0,
               F.col("total_syllables").cast("double")
               / F.col("total_words").cast("double"))
        .alias("syllables_per_word"),
        F.when(F.col("total_bigrams") > 0,
               F.col("total_bits").cast("double")
               / F.col("total_bigrams").cast("double"))
        .alias("bits_per_bigram"),
    )


@query("dedup_minhash_recall")
def dedup_minhash_recall(spark, sf_dir):
    """Measured MinHash-LSH recall vs exact all-pairs shingle Jaccard
    at thresholds 0.3/0.7/0.9 on a hash-sampled corpus slice
    (dedup.minhash_recall_report) — the text-dedup twin of
    ann_recall_lsh AND an empirical S-curve of the 4x4 banding (near-
    total recall above 0.9, ~0.2 at 0.3: the midpoint is 0.707). The
    quadratic truth side runs on the doc_id%4 sample only."""
    d = _tp(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    return dedup.minhash_recall_report(d, thresholds=(0.3, 0.7, 0.9))


@query("hll_distinct_orders")
def hll_distinct_orders(spark, sf_dir):
    """HyperLogLog distinct-key estimate next to the exact count — the
    bounded-memory DISTINCT sibling of the count-min sketch: the register
    table is at most 2^p rows at ANY key cardinality and merges by
    element-wise MAX (per-shard register tables roll up into any window
    without rescanning — the 100 TB shape the exact countDistinct
    shuffle lacks). Keyed on the SF-scaling order key (15k distinct at
    sf0.01 — the estimator's working regime at m=1024, unlike the
    31-token fixture vocabulary). The register grid is deterministic
    (frozen hash kernel), the harmonic sum exact-integer, the estimate
    one double division — fully oracle-gated, with the measured relative
    error as an output column (operators/sketch.py)."""
    from .operators import sketch

    keys = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k")
    )
    est = sketch.hll_estimate(sketch.hll_registers(keys, "k", p=10), p=10)
    exact = keys.agg(
        F.countDistinct("k").cast("long").alias("exact_distinct")
    )
    ex = F.col("exact_distinct").cast("double")
    return est.crossJoin(exact).select(
        "m", "used_registers", "zero_registers", "sum_pow", "hll_estimate",
        "exact_distinct",
        ((F.col("hll_estimate") - ex) / ex).alias("rel_error"),
    )


@query("contamination_semantic")
def contamination_semantic(spark, sf_dir):
    """Embedding-space benchmark-leakage screen
    (contamination.semantic_contamination): every 10th vector stands in
    for a held-out benchmark; pool vectors are flagged when a same-cell
    benchmark item sits within cosine >= 0.3 (fixture-calibrated: the
    synthetic embeddings are near-random, max cross-pair cosine 0.49 —
    real corpora use 0.85+). The quantizer is the same
    deterministic 8-cell/2-iteration trainer as embedding_kmeans, trained
    over the full table and passed in — one training pass shared by both
    sides, per-cell confinement bounds the pair join."""
    from .operators.contamination import semantic_contamination
    from .operators.kmeans import kmeans_fit

    emb = dedup.ensure_parallelism(_t(spark, sf_dir, "embeddings"))
    cents = kmeans_fit(emb, n_clusters=8, iters=2)
    pool = emb.where(F.col("vec_id") % 10 != 0)
    bench = emb.where(F.col("vec_id") % 10 == 0)
    return semantic_contamination(
        pool, bench, threshold=0.3, centroids=cents
    )


@query("quality_lr_classifier")
def quality_lr_classifier(spark, sf_dir):
    """Hashed-feature logistic regression, the GPT-3 data-quality-
    classifier shape (selection.lr_train): full-batch gradient descent in
    2^-24 fixed point with a hard-sigmoid (shift-and-clamp — no exp, so
    the whole 3-iteration trainer is deterministic and mirrored in the
    oracle), trained curated-vs-rest on a 3/4 seed split and scored over
    every document. Per iteration: two aggregations and a <= 65-row
    collect — the k-means/BPE bounded driver-loop pattern. (Like
    quality_nb_classifier, the fixture's lang label is near-independent
    of its 31-token shared vocabulary, so accuracy here sits at the
    majority share — learning behavior is pinned on crafted separable
    corpora in tests/test_selection.py; this entry gates the trainer's
    cross-engine determinism.)"""
    from .operators.selection import lr_scores, lr_train

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id", "text",
        (F.col("lang") == "en").cast("long").alias("curated"),
    )
    train = labeled.where(F.col("doc_id") % 4 != 3)
    w, b = lr_train(train, label_col="curated", num_buckets=64,
                    iters=3, lr_shift=3)
    return lr_scores(labeled, w, b, label_col="curated", num_buckets=64)


@query("ts_ewma_orders")
def ts_ewma_orders(spark, sf_dir):
    """Per-customer exponentially-weighted moving average of order value
    (timeseries.ewma_halflife): alpha = 1/2 makes every decay weight
    dyadic, so the 16-lag window is exact integer arithmetic with ONE
    double division — the cross-engine-safe form of a smoothing
    recurrence that would otherwise accumulate float drift. One (key,
    time) sort carries all 16 lags; prices as exact DECIMAL cents;
    unique (ts, orderkey) tie-break."""
    from .operators import timeseries

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts_us"),
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .alias("price_cents"),
    )
    return timeseries.ewma_halflife(
        o, "o_custkey", ["ts_us", "o_orderkey"], "price_cents", horizon=16
    )


@query("canary_audit_docs")
def canary_audit_docs(spark, sf_dir):
    """Secret-sharer canary round trip (privacy.inject_canaries): plant a
    deterministic unique marker in 1/16 of the corpus, run the PII
    scrubber over it, and audit that every canary survived and none were
    fabricated — the memorization-audit primitive (Carlini et al. 2019)
    doubling as a pipeline-integrity gate (n_missing > 0 means a stage
    DROPS planted content). The expected set recomputes from the same
    hash expressions — no side table at any scale."""
    from .operators import privacy, textprep

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    planted = privacy.inject_canaries(docs)
    scrubbed = planted.withColumn("text", textprep.scrub_pii("text"))
    found = privacy.detect_canaries(scrubbed)
    return privacy.canary_report(found, privacy.expected_canaries(docs))


@query("wordpiece_train_corpus")
def wordpiece_train_corpus(spark, sf_dir):
    """WordPiece merge training (textprep.wordpiece_train) — the BERT
    tokenizer's likelihood-scored merge loop, 6 iterations, scored in
    exact integer bits with pair-text tie-breaks; the DuckDB oracle
    unrolls every iteration (MATERIALIZED state CTEs). Completes the
    classical subword-tokenizer family: BPE, unigram-LM, WordPiece."""
    from .operators.textprep import wordpiece_train

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    return wordpiece_train(docs, n_merges=6)


@query("wordpiece_encode_docs")
def wordpiece_encode_docs(spark, sf_dir):
    """Segment every document with the corpus-trained WordPiece merges —
    the merge REWRITE is byte-identical to BPE's, so the trained table
    drives the existing bpe_segment codegen replace chain unchanged."""
    from .operators.textprep import bpe_segment, wordpiece_train

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents"))
    merges = [tuple(r) for r in wordpiece_train(docs, n_merges=6).collect()]
    return bpe_segment(docs, merges)


@query("privacy_mondrian_customer")
def privacy_mondrian_customer(spark, sf_dir):
    """Mondrian multidimensional k-anonymization of customer
    quasi-identifiers (privacy.mondrian_anonymize): 3 levels of median
    cuts on the widest of (nationkey, account-balance cents), every cut
    gated on both halves keeping >= 20 records. All decisions derive
    deterministically from the data, so the oracle replays the full
    recursion level-for-level. The partition-based complement of the
    Samarati uniform ladder (anon_generalize_k)."""
    from .operators.privacy import mondrian_anonymize

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nat"),
        (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
        .alias("bal_cents"),
    )
    return mondrian_anonymize(
        c, ["nat", "bal_cents"], k=20, max_depth=3, id_col="c_custkey"
    )


@query("privacy_dp_histogram")
def privacy_dp_histogram(spark, sf_dir):
    """eps-DP histogram release: the integer-cents order-price binning of
    histogram_order_prices pushed through the discrete-Laplace release
    mechanism (privacy.dp_noisy_counts) — the canonical DP release shape
    for distribution publishing. Noise lands on OBSERVED bins (an empty
    bin releases nothing — acceptable for bounded-domain histograms
    where the bin grid is public; enumerate the full grid upstream when
    absence itself is sensitive). Same seed contract as
    privacy_dp_counts."""
    from .operators.privacy import dp_noisy_counts

    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    binned = o.select(
        (cents - cents % F.lit(5_000_000)).alias("bin_lo_cents"),
        (cents - cents % F.lit(5_000_000) + 5_000_000).alias("bin_hi_cents"),
    )
    return dp_noisy_counts(
        binned, ["bin_lo_cents", "bin_hi_cents"],
        eps=0.5, seed="hist-release-1",
    )


@query("quantile_sketch_prices")
def quantile_sketch_prices(spark, sf_dir):
    """Mergeable hash-sampling quantile sketch over order-price cents
    (sketch.quantile_sketch): a deterministic 1-in-16 coordinated sample
    whose kept rows each stand for 16 (Horvitz-Thompson), ranked by the
    distributed two-pass prefix sum — the QUANTILE member of the sketch
    family, union-mergeable across shards unlike KLL's order-dependent
    compaction. Reports est vs exact per percentile (the exact side is
    the same estimator at level 0), with the signed cents error as an
    output column — the HLL-style measured-error report."""
    from .operators import sketch

    src = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .alias("cents"),
    )
    kept = sketch.quantile_sketch(src, "cents", "id", level=4)
    est = sketch.quantile_sketch_estimate(kept, "cents", "id", 4)
    exact = sketch.quantile_sketch_estimate(src, "cents", "id", 0)
    return est.join(
        exact.select("pct", F.col("est_value").alias("exact_value")), "pct"
    ).select(
        "pct", "est_value", "est_rank", "n_est", "exact_value",
        (F.col("est_value") - F.col("exact_value")).alias("err_cents"),
    )


@query("anomaly_cusum_events")
def anomaly_cusum_events(spark, sf_dir):
    """Per-user two-sided CUSUM over event values in exact cents
    (timeseries.cusum_flags): the sequential mean-shift detector as two
    window aggregates over one (user, time) sort — the recurrence's
    prefix-extremum closed form, no recursion. Calibration literals:
    target 50.00, slack 20.00, alarm at 500.00 cumulative drift."""
    from .operators.timeseries import cusum_flags

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        (F.col("value").cast("decimal(12,2)") * 100).cast("long")
        .alias("value_cents"),
    )
    return cusum_flags(
        ev, "user_id", ["ts_us", "event_id"], "value_cents",
        target=5000, slack=2000, threshold=50000,
    )


@query("hll_overlap_halves")
def hll_overlap_halves(spark, sf_dir):
    """Sketch-union set algebra (sketch.hll_merge): per-shard HLL register
    tables over the customer keys of the two order-date halves merge by
    element-wise MAX into the union estimate, and inclusion-exclusion
    yields the overlap estimate |A∩B| ≈ est(A)+est(B)−est(A∪B) — corpus
    overlap WITHOUT joining the corpora, the property that lets per-day
    register tables answer any window at 100 TB. The merged register
    table is provably identical to the union's direct table (max of
    maxes), so the oracle computes the union directly; every estimate is
    one double division of exact integers and the overlap is IEEE
    arithmetic on those identical doubles."""
    from .operators import sketch

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("d"),
    )
    cut = F.lit("1995-01-01").cast("timestamp")
    ra = sketch.hll_registers(o.where(F.col("d") < cut).select("k"), "k")
    rb = sketch.hll_registers(o.where(F.col("d") >= cut).select("k"), "k")
    est_a = sketch.hll_estimate(ra).select(
        F.col("hll_estimate").alias("est_a"))
    est_b = sketch.hll_estimate(rb).select(
        F.col("hll_estimate").alias("est_b"))
    est_u = sketch.hll_estimate(sketch.hll_merge(ra, rb)).select(
        F.col("hll_estimate").alias("est_union"))
    exact = o.agg(
        F.countDistinct("k").cast("long").alias("exact_union"),
    )
    return (
        est_a.crossJoin(est_b).crossJoin(est_u).crossJoin(exact)
        .select(
            "est_a", "est_b", "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union"))
            .alias("est_overlap"),
            "exact_union",
        )
    )


@query("attribution_linear_events")
def attribution_linear_events(spark, sf_dir):
    """Linear multi-touch attribution (funnel.linear_attribution): every
    purchase splits one unit of credit across the user's click/view
    touches in the preceding 7 days. One bounded interval join (the
    events_interval_join pattern), then exact integer pair counts per
    (touch_type, k) so the float credit is one division per grid cell —
    never a row-order-dependent float sum."""
    from .operators.funnel import linear_attribution

    ev = _t(spark, sf_dir, "events")
    return linear_attribution(
        ev, "user_id", "event_type", F.unix_micros(F.col("ts")),
        "event_id", touch_types=["click", "view"], convert_type="purchase",
        window_us=7 * 86400 * 1_000_000,
    ).orderBy("touch_type", "touches_per_conversion")


@query("ols_trend_priority")
def ols_trend_priority(spark, sf_dir):
    """Per-priority OLS price trend (stats.grouped_ols): one hash
    aggregation computes the five sufficient statistics in exact
    DECIMAL(38,0) — map-side combine, one shuffle, no window — and the
    closed-form slope/intercept divide identical exact operands in both
    engines. x = days since 1992-01-01, y = order price cents."""
    from .operators.stats import grouped_ols

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("timestamp").cast("date"),
            F.lit("1992-01-01").cast("date"),
        ).cast("long").alias("x_days"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .alias("y_cents"),
    )
    return grouped_ols(o, ["o_orderpriority"], "x_days", "y_cents").orderBy(
        "o_orderpriority"
    )


@query("ab_ztest_events")
def ab_ztest_events(spark, sf_dir):
    """A/B readout (stats.two_proportion_ztest): users split by
    user_id % 2, success = the user ever purchased. One per-user
    aggregation, then the four exact arm integers; z is pure IEEE
    arithmetic (divisions of exact ints, one correctly-rounded sqrt) —
    no distributional tables, deterministic across engines."""
    from .operators.stats import two_proportion_ztest

    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("converted")
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"),
            F.col("converted"),
        )
    )
    return two_proportion_ztest(users, "variant", "converted")


@query("kmv_overlap_halves")
def kmv_overlap_halves(spark, sf_dir):
    """KMV set-overlap report (sketch.kmv_overlap) over the same customer
    halves as hll_overlap_halves — the DIRECT intersection estimator
    (union-sketch Jaccard x union estimate, Beyer et al. 2007) next to
    HLL's lossy inclusion-exclusion: at 100 TB the two sketch families
    answer union vs intersection questions from per-shard state of k
    rows / 2^p registers. Exact intersection alongside for the measured
    error, house style."""
    from .operators import sketch

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("d"),
    )
    cut = F.lit("1995-01-01").cast("timestamp")
    a, b = o.where(F.col("d") < cut), o.where(F.col("d") >= cut)
    rep = sketch.kmv_overlap(
        sketch.kmv_sketch(a, "k", k=256), sketch.kmv_sketch(b, "k", k=256),
        k=256,
    )
    exact = (
        a.select("k").distinct()
        .join(b.select("k").distinct(), "k", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    return rep.crossJoin(exact)


@query("join_size_sketch_orders")
def join_size_sketch_orders(spark, sf_dir):
    """Join-cardinality probe: estimate |orders JOIN lineitem ON
    orderkey| from bounded sketch grids BOTH ways — the CMS inner
    product (always-over additive bound, sketch.cms_inner_product) next
    to the unbiased AMS tug-of-war median (relative error 1/sqrt(width),
    scale-invariant; sketch.ams_join_size). The planner-grade
    cardinality estimate whose cost is a grid-sized equi-join no matter
    the key cardinality; exact join size and both measured errors ride
    along (cms_rel_error always >= 0)."""
    from .operators import sketch

    # 14 salted hashes per row across the two grids: the fixture's 1-3
    # parquet splits serialize that CPU without the guard (no-op at scale)
    ok = _tp(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("key"))
    lk = _tp(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("key"))
    # r12: lineitem repeats each orderkey ~4x — pre-aggregate to
    # (key, count) and sketch with weights, hashing each DISTINCT key
    # once (cell values bit-identical: w integer adds of +-1 == one add
    # of +-w). 14 salted hashes x 4x fewer lineitem rows; the identical
    # pre-agg subtree feeds both grids and the exact count through ONE
    # reused exchange.
    lkw = lk.groupBy("key").agg(F.count(F.lit(1)).alias("__w"))
    cms = sketch.cms_inner_product(
        sketch.cms_sketch(ok, "key"),
        sketch.cms_sketch(lkw, "key", weight_col="__w"),
    ).select(F.col("est_join_size").alias("cms_est"))
    ams = sketch.ams_join_size(
        sketch.ams_sketch(ok, "key"),
        sketch.ams_sketch(lkw, "key", weight_col="__w"),
    ).select(F.col("est_join_size").alias("ams_est"))
    # orders keys are unique, so |orders JOIN lineitem| is the sum of
    # matched per-key lineitem counts — same integer, 4x fewer join rows
    exact = ok.join(lkw, "key").agg(
        F.sum("__w").cast("long").alias("exact_join_size"))
    ex = F.col("exact_join_size").cast("double")
    return cms.crossJoin(ams).crossJoin(exact).select(
        "cms_est", "ams_est", "exact_join_size",
        ((F.col("cms_est").cast("double") - ex) / ex)
        .alias("cms_rel_error"),
        ((F.col("ams_est").cast("double") - ex) / ex)
        .alias("ams_rel_error"),
    )


@query("dedup_exact_ingest")
def dedup_exact_ingest(spark, sf_dir):
    """Incremental EXACT-dedup ingest (dedup.exact_ingest): the corpus is
    every doc_id % 10 != 0 document; the incoming batch is the held-out
    tenth PLUS a re-crawl — fixture rows re-presented under shifted ids
    with identical bytes (the production scenario: re-fetched URLs arrive
    with fresh ids) — so all three statuses fire: held-out originals are
    unique, re-crawled corpus members are dup_of_corpus, and re-crawled
    batch members are dup_in_batch of their in-batch original. O(batch)
    cost; the index side never shuffles (semi-join on the batch's
    distinct hashes)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    held_out = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    recrawl_batch = (
        docs.where(F.col("doc_id") % 20 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    recrawl_corpus = (
        docs.where(F.col("doc_id") % 25 == 1)
        .select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    new = held_out.unionByName(recrawl_batch).unionByName(recrawl_corpus)
    return dedup.exact_ingest(dedup.content_hash_index(corpus), new)


@query("hll_distinct_users_by_type")
def hll_distinct_users_by_type(spark, sf_dir):
    """Grouped HLL: distinct users PER EVENT TYPE from one bounded
    aggregation (sketch.hll_grouped_registers / hll_grouped_estimate —
    at most 2^p rows per group where exact grouped COUNT(DISTINCT)
    shuffles every (group, key) pair), fully oracle-gated via the frozen
    hash kernel — the auditable upgrade of agg_approx_distinct's
    engine-private sketch. Exact counts and relative error ride along,
    house style."""
    from .operators import sketch

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("k"))
    est = sketch.hll_grouped_estimate(
        sketch.hll_grouped_registers(ev, ["event_type"], "k", p=4),
        ["event_type"], p=4,
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("k").cast("long").alias("exact_distinct"))
    ex = F.col("exact_distinct").cast("double")
    return est.join(exact, "event_type").select(
        "event_type", "used_registers", "zero_registers", "sum_pow",
        "hll_estimate", "exact_distinct",
        ((F.col("hll_estimate") - ex) / ex).alias("rel_error"),
    )


@query("bootstrap_ci_order_price")
def bootstrap_ci_order_price(spark, sf_dir):
    """Poissonized bootstrap of the mean order price
    (stats.bootstrap_mean_ci): 32 deterministic resample means from ONE
    map-side-combined aggregation — integer inverse-CDF multiplicities
    on the frozen hash, exact DECIMAL sums, one double division per
    resample. Rank the 32 means for CI edges; state is 64 numbers per
    partition at any scale."""
    from .operators.stats import bootstrap_mean_ci

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .alias("cents"),
    )
    return bootstrap_mean_ci(o, "cents", "o_orderkey", n_resamples=32)


@query("chisq_type_variant_events")
def chisq_type_variant_events(spark, sf_dir):
    """Chi-squared independence of event_type x (user_id % 2) — is the
    hash split balanced across behavior? (stats.chisq_independence: the
    full R x C grid including zero cells, exact DECIMAL(38,0) cell
    terms, sorted-order fold — never a shuffle-order float sum.) The
    contingency-table sibling of ab_ztest_events."""
    from .operators.stats import chisq_independence

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("variant"),
    )
    return chisq_independence(ev, "event_type", "variant")


@query("mannwhitney_value_events")
def mannwhitney_value_events(spark, sf_dir):
    """Mann-Whitney U on event value cents across the user_id % 2 split
    (stats.mannwhitney_u) — the nonparametric A/B readout for skewed
    metrics: exact doubled midranks via the distributed two-pass prefix
    sum over the per-value count table, tie-corrected normal z from one
    fixed expression tree of exact-integer-derived doubles."""
    from .operators.stats import mannwhitney_u

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        (F.col("value").cast("decimal(12,2)") * 100).cast("long")
        .alias("cents"),
    )
    return mannwhitney_u(ev, "variant", "cents")


@query("welch_ttest_user_value")
def welch_ttest_user_value(spark, sf_dir):
    """Welch's t over per-user total event value cents, user_id % 2 split
    (stats.welch_ttest): six exact per-arm sums from one aggregation;
    t and the Welch-Satterthwaite dof are IEEE arithmetic on identical
    exact-derived doubles. Completes the A/B family: z (proportions),
    t (means), U (ranks), chi2 (contingency)."""
    from .operators.stats import welch_ttest

    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum((F.col("value").cast("decimal(12,2)") * 100)
                   .cast("long")).cast("long").alias("cents"))
        .select((F.col("user_id") % 2).cast("int").alias("variant"), "cents")
    )
    return welch_ttest(users, "variant", "cents")


@query("cuped_user_value")
def cuped_user_value(spark, sf_dir):
    """CUPED pre-period adjustment (stats.cuped_adjustment): per-user
    pre (before Jan 16) and post (from Jan 16) event value cents,
    user_id % 2 arms. theta is the pooled OLS slope of post on pre from
    the same exact DECIMAL sufficient statistics as grouped_ols; rho2
    is the variance fraction CUPED removes."""
    from .operators.stats import cuped_adjustment

    cut = F.lit("2024-01-16").cast("timestamp")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(F.col("ts") < cut, cents)), F.lit(0))
            .cast("long").alias("pre"),
            F.coalesce(F.sum(F.when(F.col("ts") >= cut, cents)), F.lit(0))
            .cast("long").alias("post"),
        )
        .select((F.col("user_id") % 2).cast("int").alias("variant"),
                "pre", "post")
    )
    return cuped_adjustment(users, "variant", "pre", "post")


@query("retrieval_rrf")
def retrieval_rrf(spark, sf_dir):
    """Hybrid retrieval via Reciprocal Rank Fusion (retrieval.rrf_fuse):
    the lexical list is indexed BM25 top-50 for a three-term query, the
    semantic list is exact cosine top-50 around query vector 7 (the
    fixtures share the 0..499 id space between documents and
    embeddings); rrf = 1/(60+r_lex) + 1/(60+r_sem), absent lists
    contribute 0, fused top-20 with an id tie-break. Each contribution
    is one IEEE division of exact integers and the two-term sum is a
    fixed-order chain, so the fused doubles are bit-identical in both
    engines."""
    from .operators.retrieval import bm25_from_index, build_term_index, rrf_fuse

    docs = _tp(spark, sf_dir, "documents")
    lex = bm25_from_index(
        build_term_index(docs), ["merge", "stream", "vector"], top_k=50
    ).select("doc_id", "rank")
    emb = _t(spark, sf_dir, "embeddings")
    sem = similarity.brute_force_topk(
        emb, emb.where(F.col("vec_id") == 7), k=50
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, sem], k_const=60, top_k=20)


@query("dedup_lines_boilerplate")
def dedup_lines_boilerplate(spark, sf_dir):
    """Line-level boilerplate removal (textprep.line_dedup, the CCNet
    pass) over a deterministic crawl rendering of the corpus: every
    document is wrapped in a constant header line plus a
    ``doc_id % 7``-keyed crawler footer line (the fixture documents are
    single-line and all distinct, so the wrap supplies the repeating
    boilerplate a web corpus would carry). Lines repeating across
    min_docs=10 documents are dropped — the header always, the footer
    variants wherever the fixture is large enough — and the prose line
    survives verbatim."""
    from .operators.textprep import line_dedup

    wrapped = _tp(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("(c) example-corpus - all rights reserved"),
            F.col("text"),
            F.concat(F.lit("fetched by crawler #"),
                     (F.col("doc_id") % 7).cast("string")),
        ).alias("text"),
    )
    return line_dedup(wrapped, min_docs=10)


@query("compaction_plan_files")
def compaction_plan_files(spark, sf_dir):
    """Small-file compaction planning (layout.compaction_plan): the file
    inventory is a deterministic rendering of orders as ingest chunks —
    one "file" per o_orderkey div 200 sized at 24 bytes/row plus the
    priority string, named part-<bucket> — packed into ~32 KiB bins by the
    distributed offset prefix sum. Adjacent-merge in file-name order
    preserves the ingest clustering; bins are exact integer offsets."""
    from .operators.layout import compaction_plan

    inv = (
        _t(spark, sf_dir, "orders")
        .groupBy((F.col("o_orderkey") - F.col("o_orderkey") % 200)
                 .alias("__bucket"))
        .agg(F.sum(F.length("o_orderpriority") + 24).cast("long")
             .alias("size_bytes"))
        .select(
            F.concat(F.lit("part-"),
                     F.lpad((F.col("__bucket") / 200).cast("long")
                            .cast("string"), 8, "0")).alias("file"),
            "size_bytes",
        )
    )
    return compaction_plan(inv, target_bytes=32768)


@query("graph_kcore_supply")
def graph_kcore_supply(spark, sf_dir):
    """3-core of the bipartite part-supplier graph (graph.kcore):
    nodes are namespaced by parity (part = 2*partkey,
    supplier = 2*suppkey+1), edges are the distinct lineitem
    part-supplier pairs; iterative peeling keeps the densely
    cross-linked supply core and reports each member's within-core
    distinct-neighbor degree. Fixed 8-iteration unroll (peeling is
    monotone, so extra iterations past the fixpoint are no-ops and the
    operator's early break is output-identical)."""
    from .operators.graph import kcore

    edges = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    core = kcore(edges, k=3, iterations=8)
    return core.select(
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier")).alias("kind"),
        F.expr("node div 2").cast("long").alias("id"),
        "core_degree",
    )


@query("tokenizer_roundtrip_docs")
def tokenizer_roundtrip_docs(spark, sf_dir):
    """Tokenizer bijectivity certification: build a size-capped vocab
    (max_size=29 of the fixture's 31 tokens, so both outcomes occur —
    ~110 clean round trips, ~390 OOV-lossy at every SF), encode every
    document, decode it back (textprep.decode_documents), and flag
    whether the decoded token stream equals the original normalized
    stream. The flag derives from the GENUINE decode comparison on the
    Spark side while the oracle derives it independently as n_oov = 0 —
    a broken decode (order, join, reassembly) fails the gate even
    though both sides agree on the counts."""
    from .operators.textprep import build_vocab, decode_documents, encode_documents

    docs = _tp(spark, sf_dir, "documents")
    vocab = build_vocab(docs, max_size=29)
    enc = encode_documents(docs, vocab)
    dec = decode_documents(enc, vocab)
    ref = docs.select(
        "doc_id", F.array_join(T.tokens(F.col("text")), " ").alias("__ref")
    )
    n_oov = F.size(
        F.filter(F.split(F.col("ids_csv"), " "), lambda x: x == F.lit("-1"))
    ).cast("long")
    return (
        enc.join(dec, "doc_id")
        .join(ref, "doc_id")
        .select(
            "doc_id", "n_tokens", n_oov.alias("n_oov"),
            (F.col("decoded_text") == F.col("__ref")).alias("roundtrip_ok"),
        )
    )


@query("embedding_hard_negatives")
def embedding_hard_negatives(spark, sf_dir):
    """Contrastive-training negative mining
    (similarity.hard_negatives): queries = vectors 0-2, top-5 cosine
    neighbors excluded as positives, 4 negatives per query drawn in
    frozen salted-hash order from the remainder — reproducible
    negatives with no RNG state, both selections through the two-phase
    per-query cascade."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.hard_negatives(
        emb, emb.where(F.col("vec_id") < 3), k_pos=5, k_neg=4
    )


@query("orc_roundtrip_docs")
def orc_roundtrip_docs(spark, sf_dir):
    """ORC interchange, driver-verifiable end-to-end: the documents
    table is written through the ORC sink (``sources/orc.py`` — Spark's
    native writer, zstd) and read back through the matching reader; the
    oracle is simply the source table, so the driver's value hash gates
    the full write/read cycle (the avro/warc roundtrip gate shape,
    DuckDB never needs to read ORC itself)."""

    from .sources.orc import orc_writer, read_orc_table

    out = _scratch("orc_rt_")
    orc_writer(spark, out)("documents", _t(spark, sf_dir, "documents"))
    return read_orc_table(spark, out + "/documents")


@query("iceberg_roundtrip_docs")
def iceberg_roundtrip_docs(spark, sf_dir):
    """Iceberg metadata-tree tier, driver-verifiable end-to-end
    (sources/iceberg.py): the documents table is committed as TWO
    snapshots of an identity-partitioned Iceberg table (create +
    append, split on source), then read back through the metadata walk
    — version-hint -> metadata.json -> manifest-list Avro -> manifest
    Avro -> exactly the live parquet files, no directory listing. The
    oracle is the source table, so the driver's value hash gates the
    whole commit/plan/read cycle (the orc/avro/warc roundtrip shape)."""

    from .sources.iceberg import append_iceberg, create_iceberg, read_iceberg

    docs = _t(spark, sf_dir, "documents")
    out = _scratch("ice_rt_") + "/tbl"
    create_iceberg(docs.where(F.col("doc_id") % 2 == 0), out,
                   partition_by="source")
    append_iceberg(docs.where(F.col("doc_id") % 2 != 0), out)
    return read_iceberg(spark, out)


@query("iceberg_v2_delete_docs")
def iceberg_v2_delete_docs(spark, sf_dir):
    """Iceberg v2 row-level deletes, driver-verifiable end-to-end
    (sources/iceberg.py): documents becomes a format-version-2
    partitioned table, a predicate's rows are committed as POSITION
    DELETE files (merge-on-read — no data file rewritten), and the
    survivors are read back through the metadata walk with the delete
    anti-join applied. The oracle is the source table under the negated
    predicate, so the driver's value hash gates the whole v2
    sequence-number/delete-manifest/anti-join cycle."""

    from .sources.iceberg import (create_iceberg, delete_iceberg_rows,
                                  read_iceberg)

    docs = _t(spark, sf_dir, "documents")
    out = _scratch("ice_v2_") + "/tbl"
    create_iceberg(docs, out, partition_by="source", format_version=2)
    delete_iceberg_rows(spark, out, "doc_id % 7 = 0 OR lang = 'de'")
    return read_iceberg(spark, out)


@query("iceberg_v2_upsert_docs")
def iceberg_v2_upsert_docs(spark, sf_dir):
    """Iceberg v2 MERGE (upsert) via EQUALITY DELETES, driver-verifiable
    end-to-end (sources/iceberg.py): documents becomes a
    format-version-2 table, then every tenth document is upserted with
    amended text — one equality-delete commit on the keys (spec
    equality_ids, null-safe match, strict sequence rule) plus one
    append, the spec's CDC pattern, no data file rewritten. The oracle
    is the source table with the same rows amended, so the driver's
    value hash gates last-write-wins semantics exactly."""

    from .sources.iceberg import (create_iceberg, read_iceberg,
                                  upsert_iceberg)

    docs = _t(spark, sf_dir, "documents")
    out = _scratch("ice_v2u_") + "/tbl"
    create_iceberg(docs, out, format_version=2)
    upd = (docs.where(F.col("doc_id") % 10 == 0)
           .withColumn("text", F.concat(F.col("text"), F.lit(" [v2]"))))
    upsert_iceberg(spark, out, upd, ["doc_id"])
    return read_iceberg(spark, out)


@query("iceberg_compact_docs")
def iceberg_compact_docs(spark, sf_dir):
    """Iceberg compaction (rewriteDataFiles), driver-verifiable
    end-to-end (sources/iceberg.py): a v2 table accumulates position-
    delete debt, then ONE REPLACE snapshot materializes the merge-on-
    read view sorted by doc_id — the deletes are physically purged (the
    read plan has no anti-joins left) and the sorted layout re-tightens
    per-file bounds. The oracle is the source table under the negated
    predicate: a value-hash match proves compaction changed the LAYOUT
    and nothing else."""

    from .sources.iceberg import (create_iceberg, delete_iceberg_rows,
                                  read_iceberg, rewrite_iceberg_files)

    docs = _t(spark, sf_dir, "documents")
    out = _scratch("ice_cmp_") + "/tbl"
    create_iceberg(docs, out, format_version=2)
    delete_iceberg_rows(spark, out, "doc_id % 5 = 2")
    rewrite_iceberg_files(spark, out, sort_by=["doc_id"],
                          target_partitions=4)
    return read_iceberg(spark, out)


@query("iceberg_migrate_docs")
def iceberg_migrate_docs(spark, sf_dir):
    """In-place Delta -> Iceberg migration, driver-verifiable end-to-end
    (sources/iceberg.py + sources/deltalog.py): documents is committed
    as a Delta table, the Iceberg metadata tree is built NEXT TO the
    Delta log over the SAME parquet files (zero data copied, bounds
    harvested from the existing footers), and the migrated table
    immediately supports v2 row-level deletes. The oracle is the source
    table under the negated predicate, gating the whole
    write/migrate/delete/read chain."""

    from .plans.on_conflict import OnConflict
    from .sources.deltalog import merge_deltalog
    from .sources.iceberg import (delete_iceberg_rows,
                                  migrate_delta_to_iceberg, read_iceberg)

    docs = _t(spark, sf_dir, "documents")
    path = _scratch("ice_mig_") + "/tbl"
    merge_deltalog(spark, docs, path, ["doc_id"], OnConflict.do_update())
    migrate_delta_to_iceberg(path, format_version=2)
    delete_iceberg_rows(spark, path, "doc_id % 9 = 4")
    return read_iceberg(spark, path)


@query("iceberg_transforms_orders")
def iceberg_transforms_orders(spark, sf_dir):
    """Iceberg PARTITION TRANSFORMS driver-verifiable end-to-end
    (sources/iceberg.py): orders is committed under a multi-field
    transformed spec — ``month(o_orderdate)`` (the date-binned layout
    every real 100 TB table uses) x ``bucket[8](o_custkey)`` (the
    spec's Murmur3 hash) — in ONE partitionBy job, then read back
    through transform-aware inclusive-projection pruning: the month
    field prunes the date range and the bucket field prunes the customer
    equality BEFORE any data IO, with the residual filter making the
    result exact. The oracle is the plain filtered source table, so the
    driver hash gates write-path transform values, metadata recording,
    projection pruning, and the residual in one gate (14/11/3 rows at
    sf0.001/0.01/0.1 — never empty)."""
    import datetime

    from .sources.iceberg import create_iceberg, read_iceberg

    from .sources.iceberg import partition_transform_columns

    spec = [("o_orderdate", "month"), ("o_custkey", "bucket[8]")]
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    # co-locate each partition tuple in one task: one data file per
    # (month, bucket) tuple instead of (tasks x tuples) small files
    orders = orders.repartition(
        32, *partition_transform_columns(orders, spec))
    out = _scratch("ice_tf_") + "/tbl"
    create_iceberg(orders, out, partition_by=spec)
    got = read_iceberg(
        spark, out,
        predicates=[("o_orderdate", ">=", datetime.datetime(1996, 6, 1)),
                    ("o_custkey", "=", 14)])
    return got.select(
        "o_orderkey", "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .alias("o_orderdate_us"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("double")
        .alias("total_price"),
    )


@query("iceberg_decimal_orders")
def iceberg_decimal_orders(spark, sf_dir):
    """Iceberg DECIMAL partition transforms driver-verifiable end-to-end
    (sources/iceberg.py): orders' price becomes an EXACT decimal(12,2)
    (integer cents via ``floor(x*100)`` — the same IEEE ops both
    engines, so the cross-engine row set is bit-stable), committed under
    ``truncate[2000000](price)`` (20000.00-wide unscaled bins, the
    spec's decimal truncate) x ``bucket[8](price)`` (Appendix B: Murmur3
    of the minimal-bytes two's-complement big-endian unscaled value),
    then range-read back — the truncate field prunes the price range at
    plan time through inclusive projection, decimal partition values
    round-trip the manifest Avro as the decimal logical type, and the
    residual filter makes the result exact. Oracle: the integer-cents
    filter on the source table (30/326 rows at sf0.001/0.01)."""
    import decimal

    from .sources.iceberg import (create_iceberg,
                                  partition_transform_columns,
                                  read_iceberg)

    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    price = (cents.cast("decimal(20,0)")
             / F.lit(100).cast("decimal(3,0)")).cast("decimal(12,2)")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", price.alias("price"))
    spec = [("price", "truncate[2000000]"), ("price", "bucket[8]")]
    orders = orders.repartition(
        32, *partition_transform_columns(orders, spec))
    out = _scratch("ice_dec_") + "/tbl"
    create_iceberg(orders, out, partition_by=spec)
    got = read_iceberg(
        spark, out,
        predicates=[("price", ">=", decimal.Decimal("350000.00")),
                    ("price", "<", decimal.Decimal("360000.00"))])
    return got.select(
        "o_orderkey", "o_custkey",
        F.col("price").cast("double").alias("price_d"))


@query("iceberg_partitions_orders")
def iceberg_partitions_orders(spark, sf_dir):
    """Iceberg ``partitions`` METADATA TABLE driver-verifiable
    end-to-end (sources/iceberg.py): orders is committed under a
    ``month(o_orderdate)`` x ``truncate[5000000](price)`` spec (exact
    integer-cents decimal — both transforms SQL-expressible, unlike
    bucket), and the gate returns the metadata-only per-partition-tuple
    row counts — zero data IO on the read side. The oracle is the plain
    GROUP BY of the same binning on the source table, so the driver
    hash gates write-path partition values AND the metadata rollup in
    one gate."""
    from .sources.iceberg import (create_iceberg, iceberg_partitions,
                                  partition_transform_columns)

    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    price = (cents.cast("decimal(20,0)")
             / F.lit(100).cast("decimal(3,0)")).cast("decimal(12,2)")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", price.alias("price"))
    spec = [("o_orderdate", "month"), ("price", "truncate[5000000]")]
    orders = orders.repartition(
        32, *partition_transform_columns(orders, spec))
    out = _scratch("ice_parts_") + "/tbl"
    create_iceberg(orders, out, partition_by=spec)
    parts = iceberg_partitions(spark, out)
    return parts.select(
        F.get_json_object("partition", "$.o_orderdate_month")
        .cast("int").alias("month_idx"),
        F.get_json_object("partition", "$.price_trunc")
        .cast("decimal(13,2)").cast("double").alias("price_bin"),
        F.col("record_count").alias("n_rows"),
    )


@query("iceberg_tag_docs")
def iceberg_tag_docs(spark, sf_dir):
    """Iceberg snapshot REFS driver-verifiable end-to-end
    (sources/iceberg.py): half of documents is committed and TAGGED
    ``v1``, the other half appends, a v2 position delete screens the
    current head, snapshots are EXPIRED down to the head — and the read
    resolves ``ref="v1"``, which must still see exactly the pre-append,
    pre-delete first half because the tag retains its snapshot through
    expiry. The oracle is the plain first-half source table, so the
    driver hash gates ref resolution, tag immutability through
    later commits, and expiry retention in one gate."""
    from .sources.iceberg import (append_iceberg, create_iceberg,
                                  delete_iceberg_rows,
                                  expire_iceberg_snapshots, read_iceberg,
                                  set_iceberg_ref)

    docs = _t(spark, sf_dir, "documents")
    out = _scratch("ice_tag_") + "/tbl"
    create_iceberg(docs.where(F.col("doc_id") % 2 == 0), out,
                   format_version=2)
    set_iceberg_ref(out, "v1", kind="tag")
    append_iceberg(docs.where(F.col("doc_id") % 2 != 0), out)
    delete_iceberg_rows(spark, out, "doc_id % 5 = 1")
    expire_iceberg_snapshots(out, keep_last=1)
    return read_iceberg(spark, out, ref="v1")


@query("iceberg_rename_docs")
def iceberg_rename_docs(spark, sf_dir):
    """Iceberg RENAME schema evolution driver-verifiable end-to-end
    (sources/iceberg.py): half of documents is committed, ``n_chars`` is
    renamed to ``len_chars`` in a metadata-only commit (field-id kept,
    name-mapping recorded), the other half appends under the NEW name,
    and a v2 position delete predicated ON the renamed column screens
    both generations — so the read must resolve pre-rename files through
    the name history (coalesce scan), apply the delete to both, and emit
    the current schema. The oracle is the source table with the column
    aliased and the delete predicate negated."""

    from .sources.iceberg import (append_iceberg, create_iceberg,
                                  delete_iceberg_rows, read_iceberg,
                                  rename_iceberg_column)

    docs = _t(spark, sf_dir, "documents")
    out = _scratch("ice_rn_") + "/tbl"
    create_iceberg(docs.where(F.col("doc_id") % 2 == 0), out,
                   format_version=2)
    rename_iceberg_column(out, "n_chars", "len_chars")
    append_iceberg(
        docs.where(F.col("doc_id") % 2 != 0)
            .withColumnRenamed("n_chars", "len_chars"), out)
    delete_iceberg_rows(spark, out, "len_chars % 5 = 1")
    return read_iceberg(spark, out)


@query("iceberg_evolution_docs")
def iceberg_evolution_docs(spark, sf_dir):
    """Iceberg PARTITION SPEC EVOLUTION driver-verifiable end-to-end
    (sources/iceberg.py): half of documents is committed under an
    identity-on-lang spec, the default spec then evolves to
    ``bucket[4](source)`` in a metadata-only commit, the other half
    appends under the NEW spec, a v2 position delete screens both
    generations, and the read predicates on ``lang`` — so plan-time
    pruning must project the predicate through each file's OWN spec
    (generation-1 files prune on their identity field, generation-2
    files fall through to bounds + the residual). The oracle is the
    plain filtered source table minus the deleted slice."""

    from .sources.iceberg import (append_iceberg, create_iceberg,
                                  delete_iceberg_rows, read_iceberg,
                                  update_iceberg_partition_spec)

    docs = _t(spark, sf_dir, "documents")
    out = _scratch("ice_ev_") + "/tbl"
    create_iceberg(docs.where(F.col("doc_id") % 2 == 0), out,
                   partition_by="lang", format_version=2)
    update_iceberg_partition_spec(out, [("source", "bucket[4]")])
    append_iceberg(docs.where(F.col("doc_id") % 2 != 0), out)
    delete_iceberg_rows(spark, out, "doc_id % 6 = 3")
    return read_iceberg(spark, out, predicates=[("lang", "=", "en")])


def _collision_urls(spark, sf_dir):
    """documents -> (doc_id, url) where the PATH keys on doc_id % 50 and
    the volatile parts (tracking params, fragment) key on doc_id — so
    canonicalization genuinely collapses distinct raw URLs. One source
    of truth with the oracle's SQL builder (_COLLISION_URL_EXPR)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/page/"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("?utm_source=crawl&ref="),
            F.col("doc_id").cast("string"),
            F.lit("#sec"), (F.col("doc_id") % 7).cast("string"),
        ).alias("url"),
    )


@query("dedup_url_canonical")
def dedup_url_canonical(spark, sf_dir):
    """Canonical-URL exact dedup — the first dedup rung of a web-corpus
    intake (CCNet/C4 drop refetches of the same page before any content
    hashing): canonicalize (tracking params, fragments, default ports
    stripped — operators/urls.py), group by the canonical form, keep
    the lowest doc id and count the collapsed fetches. One projection +
    one hash aggregation on the canonical key; at 100 TB this is the
    cheapest shuffle in the pipeline (the key is ~100 bytes and the
    payload two int64s)."""
    from .operators.urls import normalize_url

    u = _collision_urls(spark, sf_dir)
    return (
        u.select("doc_id", normalize_url(F.col("url")).alias("url_canonical"))
        .groupBy("url_canonical")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


@query("lang_confusion_matrix")
def lang_confusion_matrix(spark, sf_dir):
    """Language-ID evaluation readout: confusion matrix of the stopword
    language identifier against the labeled ``lang`` column, with each
    row's share of its true-label total (recall decomposition). The
    prediction pass is the existing map-only scorer; the matrix is one
    hash aggregation on the (true, predicted) pair — a bounded
    languages^2 grid — and the share divides exact int64 counts inside
    a label-partitioned window over that grid."""
    d = _t(spark, sf_dir, "documents")
    pred = text_analysis.language_id(d)
    grid = (
        d.select("doc_id", "lang")
        .join(pred.select("doc_id", "predicted_lang"), "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return grid.select(
        "lang", "predicted_lang", "n_docs",
        (F.col("n_docs").cast("double")
         / F.sum("n_docs").over(w).cast("double")).alias("row_share"),
    )


@query("zipf_fit_tokens")
def zipf_fit_tokens(spark, sf_dir):
    """Zipf's-law fit of the token frequency distribution: OLS slope of
    bits(freq) against bits(rank) over the top-1000 tokens — the
    corpus-health readout (natural text sits near slope -1; a corpus of
    boilerplate or spam bends the curve). ``bits(n) = length(bin(n))``
    is the engine's exact integer log2 (the doc_surprisal rule), so the
    regression sums are exact int64 and the slope/intercept are single
    IEEE divisions on identical integers in both engines.

    Scale: one token count aggregation (vocabulary-bounded), top-1000
    via TakeOrderedAndProject, ranking and sums confined to those 1000
    rows. The corpus contributes exactly one shuffle."""
    d = _tp(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(1000)
    )
    xy = freq.select(
        F.length(F.expr("bin(row_number() OVER (ORDER BY freq DESC, token ASC))"))
         .cast("long").alias("x"),
        F.length(F.expr("bin(freq)")).cast("long").alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_fit"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
    )
    slope = (
        (F.col("n_fit") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y"))
        .cast("double")
        / (F.col("n_fit") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x"))
        .cast("double")
    )
    return sums.select(
        "n_fit", "sum_x", "sum_y", "sum_xx", "sum_xy",
        slope.alias("zipf_slope"),
    )


@query("ngram_novelty_release")
def ngram_novelty_release(spark, sf_dir):
    """Incoming-batch novelty against the prior release: for each doc of
    the deterministic 1/4 batch slice (doc_id % 4 = 3), the share of its
    distinct 5-grams NOT present anywhere in the 3/4 prior corpus — the
    inverse of the contamination screen, answering the curator's
    question "does this new crawl add anything". Same scale shape as
    contamination_report (distinct-gram semi-join, gram-keyed —
    vocabulary-bounded, never doc x doc)."""
    from .operators.contamination import contamination_report

    d = _t(spark, sf_dir, "documents")
    prior = d.where(F.col("doc_id") % 4 < 3)
    batch = d.where(F.col("doc_id") % 4 == 3)
    rep = contamination_report(prior, batch, n=5)
    return rep.select(
        "doc_id", "n_grams",
        (F.col("n_grams") - F.col("n_contaminated")).cast("long")
        .alias("n_novel"),
        F.when(
            F.col("n_grams") > 0,
            (F.col("n_grams") - F.col("n_contaminated")).cast("double")
            / F.col("n_grams").cast("double"),
        ).alias("novelty_ratio"),
    )


@query("simjoin_containment_adjacent")
def simjoin_containment_adjacent(spark, sf_dir):
    """Directional n-gram containment on the adjacent-id candidate pairs
    (dedup.ngram_containment_pairs): the doc-in-doc / quote-detection
    coefficient |A∩B|/|A| that resemblance (Jaccard) misses when sizes
    differ — same candidate-pair plan as ngram_jaccard_adjacent."""
    d = _t(spark, sf_dir, "documents")
    pairs = d.select(F.col("doc_id").alias("id_a"),
                     (F.col("doc_id") + 1).alias("id_b"))
    return dedup.ngram_containment_pairs(d, pairs)


@query("remix_water_fill")
def remix_water_fill(spark, sf_dir):
    """Water-filling token-budget allocation across sources
    (sampling.water_fill_budget): spend half the corpus's tokens with a
    common per-domain waterline — small domains keep everything, big
    ones are cut to the line. The per-source token counts are one
    corpus aggregation; the closed-form waterline is exact integer
    arithmetic over the bounded domain table. Budget = total div 2
    computed on the oracle side from the same counts, so both engines
    derive the identical literal-free allocation."""
    from .operators.sampling import water_fill_budget

    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.sum(F.size(T.tokens(F.col("text")))).cast("long").alias("n_tokens")
    )
    total = counts.agg(F.sum("n_tokens").cast("long").alias("__t"))
    budget = total.collect()[0]["__t"] // 2  # one scalar, model-sized collect
    return water_fill_budget(counts, budget)


@query("pack_efficiency_report")
def pack_efficiency_report(spark, sf_dir):
    """Packing-efficiency readout over the 256-token sequence layout
    (textprep.pack_sequences): sequence/document counts, boundary
    straddlers (docs the trainer must truncate or spill — offset
    packing's whole cost, since its closed sequences are gap-free by
    construction), the straddler share, and the tail sequence's fill.
    One aggregation over the packing projection — same two-pass
    prefix-sum plan, no extra shuffle."""
    from .operators.textprep import pack_sequences

    packed = pack_sequences(_t(spark, sf_dir, "documents"), 256)
    return packed.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.max("seq_id") + 1).cast("long").alias("n_seqs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("seq_offset") + F.col("n_tokens") > 256, 1)
              .otherwise(0)).cast("long").alias("n_straddlers"),
    ).select(
        "n_docs", "n_seqs", "total_tokens", "n_straddlers",
        (F.col("n_straddlers").cast("double")
         / F.col("n_docs").cast("double")).alias("straddle_share"),
        ((F.col("total_tokens") - F.lit(256) * (F.col("n_seqs") - 1))
         .cast("double") / F.lit(256.0)).alias("tail_fill"),
    )


@query("vocab_coverage_curve")
def vocab_coverage_curve(spark, sf_dir):
    """Tokenizer-design readout: what share of all token OCCURRENCES the
    top-k vocabulary covers, at k = 1, 2, 4, ... 1024 — the coverage
    curve that sizes a vocabulary before training one. Token counts are
    one corpus aggregation; the curve only ever consumes ranks <= 1024
    (k maxes at 2^10), so the ranking window runs AFTER a
    TakeOrderedAndProject ``limit(1024)`` (per-task heaps, one bounded
    merge — the zipf_fit_tokens plan), never over the full vocabulary,
    whose cardinality grows with the corpus (Heaps' law). Totals are a
    plain aggregation over the unranked vocab. The k-grid is a literal
    explode joined on rank <= k. Counts exact int64; coverage one
    division on identical integers."""
    d = _tp(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    total = freq.agg(F.sum("freq").cast("long").alias("total_tokens"),
                     F.count(F.lit(1)).cast("long").alias("n_vocab"))
    top = freq.orderBy(F.desc("freq"), F.asc("token")).limit(1024)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    ranked = top.select(
        "freq", F.row_number().over(w).cast("long").alias("rank")
    )
    # column shift amount: expr form (F.shiftleft only takes literals)
    ks = spark.range(0, 11).select(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias("k")
    )
    cov = (
        ks.join(ranked, ranked.rank <= ks.k)
        .groupBy("k")
        .agg(F.sum("freq").cast("long").alias("covered_tokens"),
             F.count(F.lit(1)).cast("long").alias("n_vocab_used"))
    )
    return (
        cov.crossJoin(F.broadcast(total))
        .select(
            "k", "n_vocab_used", "covered_tokens", "total_tokens",
            (F.col("covered_tokens").cast("double")
             / F.col("total_tokens").cast("double")).alias("coverage"),
        )
    )


@query("lang_id_kappa")
def lang_id_kappa(spark, sf_dir):
    """Cohen's kappa between the stopword language identifier and the
    labeled ``lang`` column — chance-corrected agreement, the one-number
    eval for a classifier against a skewed label mix. The corpus
    contributes ONE aggregation (the languages^2 grid); the grid is
    collected (bounded at n_langs^2 rows — the BPE/kmeans model-sized
    collect pattern, NOT a corpus collect) and the marginal products
    are exact Python int64 arithmetic; ``po``/``pe``/``kappa`` are the
    same IEEE double divisions DuckDB performs on the identical
    integers."""
    d = _t(spark, sf_dir, "documents")
    pred = text_analysis.language_id(d)
    grid = (
        d.select("doc_id", "lang")
        .join(pred.select("doc_id", "predicted_lang"), "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    n_docs = sum(r["n"] for r in grid)
    n_agree = sum(r["n"] for r in grid if r["lang"] == r["predicted_lang"])
    rn: dict[str, int] = {}
    cn: dict[str, int] = {}
    for r in grid:
        rn[r["lang"]] = rn.get(r["lang"], 0) + r["n"]
        cn[r["predicted_lang"]] = cn.get(r["predicted_lang"], 0) + r["n"]
    rc = sum(v * cn.get(k, 0) for k, v in rn.items())
    # mirror the oracle's CAST(int AS DOUBLE)/CAST(int AS DOUBLE): convert
    # each exact integer to double FIRST, then divide — Python's bigint
    # true division is correctly rounded from the exact rational and
    # drifts 1 ulp from the double/double quotient past 2^53
    po = float(n_agree) / float(n_docs)
    pe = float(rc) / float(n_docs * n_docs)
    # degenerate single-class corpus: kappa is 0/0 — undefined by
    # convention, emitted as NULL; guard on the EXACT integers (the
    # oracle's CASE rc = n*n), not the rounded pe
    kappa = None if rc == n_docs * n_docs else (po - pe) / (1.0 - pe)
    return spark.createDataFrame(
        [(n_docs, n_agree, rc, po, pe, kappa)],
        "n_docs long, n_agree long, rc long, po double, pe double, "
        "kappa double",
    )


@query("dedup_cluster_sizes")
def dedup_cluster_sizes(spark, sf_dir):
    """Exact-duplicate cluster-size histogram: how much of the corpus
    sits in 1-, 2-, k-way duplicate families — the census a dedup run
    reports before deleting anything (the head of this histogram IS the
    dedup savings estimate). Two hash aggregations (content key, then
    multiplicity); at 100 TB the first keys on the content hash, the
    second on a handful of small integers."""
    from .functions.hashing import stable_hash

    d = _tp(spark, sf_dir, "documents")
    clusters = d.groupBy(stable_hash(F.col("text")).alias("__h")).agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            "cluster_size", "n_clusters",
            (F.col("n_clusters") * F.col("cluster_size")).cast("long")
            .alias("n_docs"),
        )
    )


@query("source_lang_mix")
def source_lang_mix(spark, sf_dir):
    """Per-source language census: document count, language count, the
    dominant language (ties to the lexicographically first) and its
    share — the mix table a multilingual curation run checks before
    remixing. One (source, lang) aggregation, then grid-bounded windows
    over it; the share divides exact int64 counts."""
    d = _t(spark, sf_dir, "documents")
    grid = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    tot = Window.partitionBy("source")
    return (
        grid.withColumn("__rk", F.row_number().over(w))
        .withColumn("n_docs", F.sum("n").over(tot).cast("long"))
        .withColumn("n_langs", F.count(F.lit(1)).over(tot).cast("long"))
        .where(F.col("__rk") == 1)
        .select(
            "source", "n_docs", "n_langs",
            F.col("lang").alias("top_lang"),
            (F.col("n").cast("double") / F.col("n_docs").cast("double"))
            .alias("top_share"),
        )
    )


@query("sample_customers_fixed_k")
def sample_customers_fixed_k(spark, sf_dir):
    """Deterministic EXACT-k uniform sample (sampling.sample_fixed_k):
    the 100 customers whose salted hash buckets rank smallest, key
    tie-break — completing the sampler matrix next to rate-based
    hash_sample and PPS weighted_sample_topk. Plans as
    TakeOrderedAndProject: per-task top-k heaps, no corpus shuffle."""
    from .operators.sampling import sample_bucket, sample_fixed_k

    c = _tp(spark, sf_dir, "customer")
    return sample_fixed_k(c, 100, "c_custkey").select(
        "c_custkey", "c_mktsegment",
        sample_bucket("c_custkey", "_fixk").cast("long").alias("bucket"),
    )


@query("fk_fanout_profile")
def fk_fanout_profile(spark, sf_dir):
    """FK fan-out census over the declared constraint graph: per edge,
    parent/child cardinalities, how many parents actually have children,
    and the min/max/avg children per parent — the skew-and-sizing input
    a subsetting plan (plans/propagation.py) or a join-strategy choice
    reads before running. One count aggregation per edge keyed on the
    FK (the same shuffle the join itself would pay), parent counts are
    metadata-cheap scans; the union is five 1-row frames. avg divides
    exact int64 counts."""
    edges = [
        ("customer->orders", "customer", "c_custkey", "orders", "o_custkey"),
        ("orders->lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("part->lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
        ("supplier->lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
        ("nation->customer", "nation", "n_nationkey", "customer", "c_nationkey"),
    ]
    out = None
    for name, ptab, pk, ctab, fk in edges:
        parent_n = _t(spark, sf_dir, ptab).agg(
            F.count(F.lit(1)).cast("long").alias("n_parents"))
        fan = (
            _t(spark, sf_dir, ctab).groupBy(fk)
            .agg(F.count(F.lit(1)).cast("long").alias("__n"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("parents_with_children"),
                F.sum("__n").cast("long").alias("n_children"),
                F.min("__n").cast("long").alias("min_fanout"),
                F.max("__n").cast("long").alias("max_fanout"),
            )
        )
        row = (
            fan.crossJoin(F.broadcast(parent_n))
            .select(
                F.lit(name).alias("edge"),
                "n_parents", "parents_with_children", "n_children",
                "min_fanout", "max_fanout",
                (F.col("n_children").cast("double")
                 / F.col("parents_with_children").cast("double"))
                .alias("avg_fanout"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@query("char_entropy_docs")
def char_entropy_docs(spark, sf_dir):
    """Character-distribution entropy per document in exact WHOLE BITS
    (the doc_surprisal integer-log2 rule applied to the char histogram):
    ``total_bits = sum_i c_i * (bits(n) - bits(c_i))`` over the doc's
    distinct characters — low for repetitive padding, high for
    uniform-random gibberish; with word-level repetition
    (text_repetition) this closes the quality family at the character
    level. Map-only, SINGLE-PASS in-row histogram: sort the char array
    once (O(len log len)), find run boundaries, and turn consecutive
    boundary positions into run-length counts — the original
    distinct x filter shape re-scanned the array per distinct char
    (O(alphabet x len)) and was the heaviest map in the sf1 sweep.
    Each intermediate array is BOUND TO A COLUMN before lambdas
    reference it (the lang_id CSE lesson — expressions inlined into
    higher-order lambdas re-evaluate per reference). Empty docs emit
    zero bits and NULL mean."""
    d = _tp(spark, sf_dir, "documents")
    n = F.length(F.col("text")).cast("long")

    def bits(c):
        return F.length(F.call_function("bin", c)).cast("long")

    chars = F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n.cast("int")),
                    lambda i: F.col("text").substr(i, F.lit(1))),
    ).otherwise(F.array().cast("array<string>"))
    base = d.select(
        "doc_id",
        n.alias("n_chars_counted"),
        F.array_sort(chars).alias("__s"),
    )
    s = F.col("__s")
    # 1-based positions that START a run in the sorted array; guard the
    # sequence build — sequence(1, 0) DESCENDS, it is not empty.
    # element_at raises on index 0 regardless of the i==1 disjunct's
    # value, so keep the index expression total (clamped to 1) instead
    # of relying on Or short-circuit order: at i==1 the clamped compare
    # is s[1] != s[1] = false and the first disjunct still wins.
    starts = F.when(
        F.size(s) >= 1,
        F.filter(
            F.sequence(F.lit(1), F.size(s)),
            lambda i: (i == F.lit(1))
            | (
                F.element_at(s, i)
                != F.element_at(s, F.greatest(i - F.lit(1), F.lit(1)))
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    staged = base.select(
        "doc_id", "n_chars_counted", starts.alias("__starts"))
    st = F.col("__starts")
    # run lengths: next start (or n+1 past the end) minus this start
    ends = F.concat(
        F.slice(st, F.lit(2), F.greatest(F.size(st) - 1, F.lit(0))),
        F.array((F.col("n_chars_counted") + 1).cast("int")),
    )
    counts_col = F.when(
        F.size(st) >= 1,
        F.zip_with(st, ends, lambda a, b: (b - a).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    withc = staged.select(
        "doc_id", "n_chars_counted",
        F.size(st).cast("long").alias("n_distinct_chars"),
        counts_col.alias("__counts"),
    )
    nb = bits(F.col("n_chars_counted"))
    return withc.select(
        "doc_id", "n_chars_counted", "n_distinct_chars",
        F.aggregate(
            F.col("__counts"), F.lit(0).cast("long"),
            lambda acc, c: acc + c * (nb - bits(c)),
        ).alias("total_bits"),
    ).select(
        "*",
        F.when(
            F.col("n_chars_counted") > 0,
            F.col("total_bits").cast("double")
            / F.col("n_chars_counted").cast("double"),
        ).alias("mean_bits_per_char"),
    )


@query("events_user_gini")
def events_user_gini(spark, sf_dir):
    """Activity-concentration Gini over per-user event counts
    (stats.gini_exact): the inequality number a crawl/traffic census
    reports. Per-user counts are one shuffle; the global ascending rank
    the formula needs runs through the distributed two-pass prefix
    (pack_sequences machinery) — user cardinality scales with the data,
    so no single window task ever sees it."""
    from .operators.stats import gini_exact

    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return gini_exact(counts, "n_events", "user_id")


@query("bm25_rm3_expansion")
def bm25_rm3_expansion(spark, sf_dir):
    """RM3 pseudo-relevance-feedback query expansion
    (retrieval.rm3_expansion): BM25 top-10 feedback documents weight
    their terms by exact integer tf/dl x score_fp products; the top-15
    NEW terms come back with fixed-point weights — the standard
    lexical query-expansion step of a retrieval pipeline, on the same
    deterministic BM25 arithmetic as bm25_docs."""
    from .operators.retrieval import rm3_expansion

    return rm3_expansion(
        _t(spark, sf_dir, "documents"),
        ["merge", "stream", "vector"], fb_docs=10, fb_terms=15,
    )


@query("source_kl_tokens")
def source_kl_tokens(spark, sf_dir):
    """Per-source token-distribution KL divergence from the corpus in
    whole bits (text_analysis.source_kl_divergence) — the domain-shift
    census a multi-source remix consults; exact integer bit-length
    sums, no n x N products (the pmi_collocations overflow rule)."""
    return text_analysis.source_kl_divergence(_t(spark, sf_dir, "documents"))


@query("dup_span_islands")
def dup_span_islands(spark, sf_dir):
    """Maximal cross-document duplicated spans
    (textprep.duplicate_span_islands): the longest-match readout of
    Lee et al. exact-substring dedup, recovered distributively by
    merging the duplicated-8-gram position cover into islands — one
    row per maximal span with its 0-based start and length. Sibling of
    scrub_dup_spans (which removes the cover) and dup_spans (which
    only measures the shared fraction)."""
    from .operators.textprep import duplicate_span_islands

    return duplicate_span_islands(
        dedup.ensure_parallelism(_t(spark, sf_dir, "documents")),
        k=8, min_docs=2,
    )
