"""Per-stage row-count assertions inside the composite pipeline gates.

The driver rows for ``pipeline_web_corpus`` and
``pipeline_release_orders`` cover their operator chains as ONE output
row each — a break in any intermediate stage only shows up as a wrong
final aggregate. These tests re-run each composite's stages separately
and pin the row-count invariant at every hand-off, so a future break is
localized to its stage without waiting for a driver round."""

from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.sampling import (
    grouped_split, per_group_cap,
)
from simple_anonymizer_spark.operators.textprep import normalize_text
from simple_anonymizer_spark.queries import QUERIES
from simple_anonymizer_spark.sources.parquet import read_sf_table


def test_web_corpus_stage_counts(spark, sf_dir):
    d = read_sf_table(spark, sf_dir, "documents")
    n_docs = d.count()

    # stage 1: normalize is 1:1
    norm = d.select(
        "doc_id", "source", normalize_text(F.col("text")).alias("text")
    )
    assert norm.count() == n_docs

    # stage 2: canonical exact-dedup emits one row per distinct
    # normalized text, and never more rows than its input
    n_distinct = norm.select("text").distinct().count()
    canon = norm.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", F.col("doc_id")).alias("source"),
    )
    assert canon.count() == n_distinct <= n_docs

    # stage 3: per-domain cap keeps exactly min(10, group size) per source
    per_source = {
        r["source"]: r["n"]
        for r in canon.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    capped = per_group_cap(canon, "source", 10, "doc_id")
    capped_counts = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert capped_counts == {s: min(10, n) for s, n in per_source.items()}

    # stage 4: grouped split is 1:1 and keeps each source in ONE split
    split = grouped_split(capped, "source")
    assert split.count() == sum(capped_counts.values())
    assert (
        split.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1).count() == 0
    )

    # stage 5: the driver-visible summary has one row per populated split
    # and its n_docs column re-adds to the capped total
    out = QUERIES["pipeline_web_corpus"](spark, sf_dir).collect()
    n_splits = split.select("split").distinct().count()
    assert len(out) == n_splits
    assert sum(r["n_docs"] for r in out) == sum(capped_counts.values())


def test_release_corpus_stage_counts(spark, sf_dir):
    """pipeline_release_corpus was the round-10 vacuous gate (the paper's
    min_stopwords=2 keeps ZERO fixture docs, so 0 == 0 passed every
    scale). This pins every stage non-empty at the suite SF: the quality
    gate keeps a strict non-trivial subset, the grouped split covers all
    kept docs leakage-free, the decontamination screen actually drops
    flagged train docs, and the released set is non-empty."""
    from simple_anonymizer_spark.operators import text_analysis
    from simple_anonymizer_spark.operators.contamination import (
        contamination_report,
    )

    docs = read_sf_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # stage 1: the fixture-viable quality gate keeps SOME but not ALL
    kept = (
        text_analysis.gopher_quality_flags(docs, min_stopwords=1)
        .where(F.col("keep")).select("doc_id")
    )
    n_kept = kept.count()
    assert 0 < n_kept < n_docs
    # the paper default stays pinned by crafted-doc tests elsewhere; on
    # THIS fixture it keeps nothing — the reason the composite pins 1
    assert (
        text_analysis.gopher_quality_flags(docs)
        .where(F.col("keep")).count() == 0
    )

    # stage 2: grouped split is 1:1 over kept docs, leakage-free, and
    # populates train AND test (decontamination needs both sides)
    base = docs.join(kept, "doc_id", "left_semi")
    split = grouped_split(base.select("doc_id", "source", "text"), "source")
    assert split.count() == n_kept
    assert (
        split.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1).count() == 0
    )
    per_split = {r["split"]: r["n"] for r in split.groupBy("split")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_split.get("train", 0) > 0 and per_split.get("test", 0) > 0

    # stage 3: the screen flags a non-empty strict subset of train
    flagged = (
        contamination_report(
            split.where(F.col("split") == "test"),
            split.where(F.col("split") == "train"), n=5)
        .where(F.col("flagged")).select("doc_id")
    )
    n_flagged = flagged.count()
    assert 0 < n_flagged < per_split["train"]

    # stage 4: released = split minus flagged train docs, still non-empty
    out = QUERIES["pipeline_release_corpus"](spark, sf_dir)
    assert out.count() == n_kept - n_flagged > 0


def test_release_orders_stage_counts(spark, sf_dir):
    region = read_sf_table(spark, sf_dir, "region")
    nation = read_sf_table(spark, sf_dir, "nation")
    customer = read_sf_table(spark, sf_dir, "customer")
    orders = read_sf_table(spark, sf_dir, "orders")

    # stage 1: region filter selects exactly the one ASIA row
    asia = region.where(F.col("r_name") == "ASIA")
    assert asia.count() == 1
    rkey = asia.collect()[0]["r_regionkey"]

    # stage 2: FK chain region -> nation -> customer never fans out
    nkeys = {r["n_nationkey"] for r in nation.where(
        F.col("n_regionkey") == rkey).collect()}
    n_cust = customer.where(F.col("c_nationkey").isin(nkeys)).count()
    assert 0 < n_cust < customer.count()

    # stage 3: the customer x orders join emits exactly the orders whose
    # custkey survived the subset (orders fan out, customers don't dup)
    expected_orders = (
        orders.join(
            customer.where(F.col("c_nationkey").isin(nkeys))
            .select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        ).count()
    )
    out = QUERIES["pipeline_release_orders"](spark, sf_dir)
    assert out.count() == expected_orders
    # release keys stay unique: one row per released order
    assert out.select("o_orderkey").distinct().count() == expected_orders
