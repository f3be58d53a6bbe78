"""Operator-level unit tests not covered by the oracle harness."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from simple_anonymizer_spark.functions import lens as L
from simple_anonymizer_spark.operators import multimodal
from simple_anonymizer_spark.plans import TableSpec, apply_spec
from simple_anonymizer_spark.sources.parquet import read_sf_table


def test_extract_meta_native_matches_pandas_path(spark, sf_dir):
    media = multimodal.with_binary_content(read_sf_table(spark, sf_dir, "documents"))
    via_pandas = {
        r.media_id: (r.n_bytes, r.content_hash)
        for r in multimodal.extract_meta(media).collect()
    }
    via_native = {
        r.media_id: (r.n_bytes, r.content_hash)
        for r in multimodal.extract_meta_native(media).collect()
    }
    assert via_pandas == via_native


def test_decode_image_default_rejects_unknown_format(spark):
    """The default decoder is now the real stdlib PNG/BMP reader
    (operators/codecs.py); bytes that are neither format fail loudly in
    the executor task rather than returning garbage dims."""
    import pytest

    media = spark.createDataFrame([(1, b"x", "image/png")], multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="unrecognized image format"):
        multimodal.decode_image(media).collect()


def test_decode_image_with_injected_decoder(spark):
    media = spark.createDataFrame([(1, b"abcd", "image/png")], multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_image(media, decoder=lambda b: (len(b), len(b) * 2)).collect()
    assert (out[0].width, out[0].height) == (4, 8)


def test_map_opt_string_through_json_lens(spark):
    """opt=True through a JSON lens: nulls pass through (JsonLens.modifyOpt
    maps over present values only, src/Lens.scala:71-74); fn result
    replaces the focused value, None keeps the original."""
    df = spark.createDataFrame(
        [('{"name":"bob"}',), (None,)], "j string"
    )
    keep_or_mask = lambda v: None if v == "bob" else "MASKED"  # noqa: E731
    spec = TableSpec.select(
        lambda r: [r.j.map_opt_string(keep_or_mask, lens=L.Field("name"))]
    )
    rows = [r.j for r in apply_spec(df, spec).collect()]
    by_null = sorted(rows, key=lambda v: v is None)
    assert by_null[1] is None
    assert json.loads(by_null[0]) == {"name": "bob"}  # None result -> original kept


def test_lsh_topk_subset_of_bruteforce_queries(spark, sf_dir):
    """LSH top-k returns <= k ranked neighbors per query from the query's
    own bucket — ranks contiguous from 1."""
    from simple_anonymizer_spark.operators import similarity

    e = read_sf_table(spark, sf_dir, "embeddings")
    out = similarity.lsh_topk(e, e.where(F.col("vec_id") < 3), k=3, planes=4)
    per_query = {}
    for r in out.collect():
        per_query.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_resize_and_frame_sample_plumbing(spark, sf_dir):
    media = multimodal.with_binary_content(
        read_sf_table(spark, sf_dir, "documents").limit(20))
    resized = multimodal.resize_images(media, 16, 4).collect()
    assert all(len(r.content) == 64 for r in resized if r.content)
    assert all((r.width, r.height) == (16, 4) for r in resized)

    frames = multimodal.sample_frames(media, every_n_bytes=50, max_frames=3)
    rows = frames.collect()
    assert rows, "no frames sampled"
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_index)
    for mid, idxs in per_media.items():
        assert sorted(idxs) == list(range(len(idxs)))
        assert len(idxs) <= 3


def test_asof_exact_timestamp_tie_excluded(spark):
    """as-of is strict: a right row at the SAME timestamp as the left row
    must not match (mirrors the DuckDB `l.ts > r.ts` oracle condition)."""
    import datetime as dt

    from simple_anonymizer_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, 10, t0)], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(10, t0, 99)], "user_id long, ts timestamp, sid long")
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["sid"]).collect()
    assert out[0].sid_asof is None

    earlier = spark.createDataFrame(
        [(10, t0 - dt.timedelta(seconds=1), 99)], "user_id long, ts timestamp, sid long"
    )
    out2 = asof_join(left, earlier, ["user_id"], "ts", "ts", ["sid"]).collect()
    assert out2[0].sid_asof == 99


def test_asof_all_right_cols_from_same_row(spark):
    """All right_cols must come from the SAME matched right row — a NULL in
    one column of the latest row is preserved, never backfilled from an
    earlier right row (ADVICE r1: struct-packed last(ignorenulls))."""
    import datetime as dt

    from simple_anonymizer_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 12, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(30))], "event_id long, user_id long, ts timestamp"
    )
    # Earlier right row fully populated; latest right row has NULL in `b`.
    right = spark.createDataFrame(
        [(10, t(10), 1, "old_b"), (10, t(20), 2, None)],
        "user_id long, ts timestamp, a long, b string",
    )
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["a", "b"]).collect()
    assert out[0].a_asof == 2
    assert out[0].b_asof is None  # NOT "old_b"


def test_asof_right_timestamp_tie_deterministic(spark):
    """Equal right timestamps resolve to the greatest right-struct row."""
    import datetime as dt

    from simple_anonymizer_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 12, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, t(20), 7, "x"), (10, t(20), 3, "y")],
        "user_id long, ts timestamp, a long, b string",
    )
    for _ in range(3):
        out = asof_join(left, right, ["user_id"], "ts", "ts", ["a", "b"]).collect()
        assert (out[0].a_asof, out[0].b_asof) == (7, "x")


def test_salted_join_rejects_right_preserving(spark):
    import pytest

    from simple_anonymizer_spark.operators.skew import salted_join

    df = spark.range(10).withColumnRenamed("id", "k")
    for bad in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(df, df, "k", how=bad)
    # left-preserving joins still accepted
    assert salted_join(df, df, "k", how="left_semi").count() == 10


def test_embedding_fixture_dimension_guard(sf_dir):
    """The oracle SQL enumerates vector indices 1..EMBEDDING_DIM; if the
    fixture dimension drifts, fail loudly here instead of silently
    comparing truncated vectors (ADVICE r1)."""
    import duckdb

    from simple_anonymizer_spark.oracle.queries import EMBEDDING_DIM

    dims = duckdb.sql(
        f"SELECT DISTINCT len(embedding) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    assert dims == [(EMBEDDING_DIM,)]


def test_text_ratios_null_on_zero_tokens(spark):
    """Whitespace-only text: every token ratio is NULL (not NaN) to match
    DuckDB's x/0 -> NULL semantics (ADVICE r1)."""
    import math

    from simple_anonymizer_spark.operators import text_analysis

    df = spark.createDataFrame([(1, "   "), (2, "hi there")], "doc_id long, text string")
    stats = {r.doc_id: r for r in text_analysis.text_stats(df).collect()}
    assert stats[1].mean_token_len is None
    assert stats[2].mean_token_len == 3.5

    qual = {r.doc_id: r for r in text_analysis.quality_score(df).collect()}
    assert qual[1].stopword_ratio is None and qual[1].type_token_ratio is None
    assert qual[2].type_token_ratio == 1.0
    for r in list(stats.values()) + list(qual.values()):
        for v in r.asDict().values():
            assert not (isinstance(v, float) and math.isnan(v))


def test_repetition_metrics_edges(spark):
    """Hand-computed repetition signals, including the zero/one-token edges
    and the overlapping-run > 1.0 top_bigram_frac case."""
    from simple_anonymizer_spark.operators import text_analysis

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, bigrams: "a a" x3
            (2, "x y x y"),          # bigrams: "x y" x2, "y x" x1
            (3, "one"),              # single token: no bigrams
            (4, "   "),              # zero tokens
            (5, "all words unique here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text_analysis.repetition_metrics(df).collect()}
    r1 = rows[1]
    assert (r1.n_tokens, r1.top_bigram_n) == (4, 3)
    assert r1.dup_token_frac == 0.75
    assert r1.top_bigram_frac == 1.5          # overlapping run exceeds 1.0
    assert r1.dup_bigram_frac == 2.0 / 3.0
    r2 = rows[2]
    assert (r2.top_bigram_n, r2.dup_bigram_frac) == (2, 1.0 / 3.0)
    r3 = rows[3]
    assert (r3.n_tokens, r3.top_bigram_n, r3.top_bigram_frac) == (1, 0, 0.0)
    assert r3.dup_bigram_frac is None         # no bigrams -> NULL, not NaN
    r4 = rows[4]
    assert r4.dup_token_frac is None and r4.top_bigram_frac is None
    r5 = rows[5]
    assert (r5.dup_token_frac, r5.top_bigram_n) == (0.0, 1)


def test_duplicate_spans_shared_fraction(spark):
    """Cross-doc k-gram sharing: identical docs are 100% shared, an
    overlapping prefix is partially shared, unique text is 0%."""
    from simple_anonymizer_spark.operators import text_analysis

    shared_prefix = "0123456789" * 3          # 30 chars
    df = spark.createDataFrame(
        [
            (1, shared_prefix + "AAAA"),
            (2, shared_prefix + "BBBB"),
            (3, "completely different content here"),
            (4, "tiny"),                      # shorter than k -> 1 whole-text gram
            (5, "tiny"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            text_analysis.duplicate_spans(df, k=30).collect()}
    # docs 1 and 2 share exactly the grams fully inside the common prefix:
    # positions 1..1 of a 34-char text give 5 grams; only position 1 (the
    # pure prefix gram) is common.
    assert rows[1].n_grams == 5 and rows[1].n_shared_grams == 1
    assert rows[2].n_shared_grams == 1
    assert rows[3].n_shared_grams == 0 and rows[3].shared_frac == 0.0
    assert rows[4].n_grams == 1 and rows[4].shared_frac == 1.0
    assert rows[5].shared_frac == 1.0


def test_k_anonymity_known_groups(spark):
    from simple_anonymizer_spark.operators.privacy import k_anonymity

    df = spark.createDataFrame(
        [("a", 1)] * 6 + [("b", 1)] * 3 + [("c", 2)],
        "qi string, other int",
    )
    r = k_anonymity(df, ["qi"], k_threshold=5).collect()[0]
    assert r.k_anonymity == 1      # the 'c' singleton
    assert r.n_groups == 3
    assert r.n_rows == 10
    assert r.rows_at_risk == 4     # 'b' (3) + 'c' (1) under threshold 5
    assert r.pct_at_risk == 40.0


def test_l_diversity_detects_homogeneous_group(spark):
    from simple_anonymizer_spark.operators.privacy import l_diversity

    df = spark.createDataFrame(
        [("a", "flu"), ("a", "flu"), ("a", "flu"),      # homogeneous!
         ("b", "flu"), ("b", "cold"), ("b", "ulcer")],
        "qi string, diagnosis string",
    )
    r = l_diversity(df, ["qi"], "diagnosis", l_threshold=3).collect()[0]
    assert r.l_diversity == 1
    assert r.homogeneous_groups == 1
    assert r.groups_below_l == 1   # only 'a'; 'b' has l=3


def test_dp_noisy_counts_deterministic_under_seed(spark):
    from simple_anonymizer_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(i % 20, "x") for i in range(400)], "g long, v string"
    )
    a = sorted(map(tuple, dp_noisy_counts(df, ["g"], eps=0.5, seed="s1").collect()))
    b = sorted(map(tuple, dp_noisy_counts(df, ["g"], eps=0.5, seed="s1").collect()))
    assert a == b
    c = sorted(map(tuple, dp_noisy_counts(df, ["g"], eps=0.5, seed="s2").collect()))
    assert a != c  # fresh seed, fresh noise


def test_dp_noisy_counts_high_eps_is_accurate(spark):
    from simple_anonymizer_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(i % 25, "x") for i in range(1000)], "g long, v string"
    )
    out = {r.g: r.noisy_count for r in
           dp_noisy_counts(df, ["g"], eps=8.0, seed="s").collect()}
    diffs = [abs(v - 40) for v in out.values()]
    assert max(diffs) <= 2
    assert sum(1 for d in diffs if d == 0) >= 20  # eps=8: noise ~always 0


def test_dp_noisy_counts_noise_actually_present_and_clamped(spark):
    from simple_anonymizer_spark.operators.privacy import dp_noisy_counts

    # 200 singleton groups, heavy noise: some counts move, none below 0.
    df = spark.createDataFrame([(i,) for i in range(200)], "g long")
    out = [r.noisy_count for r in
           dp_noisy_counts(df, ["g"], eps=0.2, seed="s").collect()]
    assert all(v >= 0 for v in out)
    assert any(v != 1 for v in out)
    assert any(v == 0 for v in out)  # clamp engaged somewhere at eps=0.2


def test_dp_noise_distribution_roughly_symmetric(spark):
    from simple_anonymizer_spark.operators.privacy import dp_noisy_counts

    # Large equal groups (no clamping): mean noise over 500 groups ~ 0.
    df = spark.createDataFrame(
        [(i % 500, "x") for i in range(5000)], "g long, v string"
    )
    out = [r.noisy_count - 10 for r in
           dp_noisy_counts(df, ["g"], eps=1.0, seed="sym").collect()]
    assert abs(sum(out)) / len(out) < 0.5
    assert min(out) < 0 < max(out)


def test_dlap_thresholds_monotone_and_centered():
    from simple_anonymizer_spark.operators.privacy import dlap_thresholds

    t = dlap_thresholds(0.5)
    assert t == sorted(t)
    k = len(t) // 2
    # CDF(-1) < 0.5 <= CDF(0): the median of the noise is 0
    assert t[k - 1] < 2**30 <= t[k]


def _gen(spark, rows, ladder, k):
    from simple_anonymizer_spark.operators.privacy import generalize_to_k

    df = spark.createDataFrame(rows, "id long, zip string, age long")
    out = generalize_to_k(df, "id", ladder, k)
    return {r.id: tuple(r)[1:] for r in out.collect()}


_LADDER = {
    "zip": ["zip", "substr(zip, 1, 3)", "'*'"],
    "age": ["CAST(age AS STRING)",
            "CAST(CAST(floor(age / 10) * 10 AS BIGINT) AS STRING)", "'*'"],
}


def test_generalize_identity_when_already_k_anonymous(spark):
    rows = [(i, "12345", 30) for i in range(4)]
    out = _gen(spark, rows, _LADDER, k=2)
    assert all(v == ("12345", "30", 0) for v in out.values())


def test_generalize_picks_minimal_sufficient_level(spark):
    # Level 0: all four rows distinct (singletons). Level 1: zip prefixes
    # and age decades collapse into two groups of 2 -> k=2 holds.
    rows = [(1, "12345", 31), (2, "12346", 34),
            (3, "98701", 57), (4, "98702", 52)]
    out = _gen(spark, rows, _LADDER, k=2)
    assert out[1] == ("123", "30", 1)
    assert out[3] == ("987", "50", 1)


def test_generalize_falls_back_to_full_suppression(spark):
    rows = [(1, "12345", 31), (2, "98702", 52)]
    out = _gen(spark, rows, _LADDER, k=2)
    assert out[1] == ("*", "*", 2)
    assert out[2] == ("*", "*", 2)


def test_generalize_short_ladder_repeats_last_rung(spark):
    ladder = {"zip": ["zip", "'*'"],   # 2 rungs vs age's 3
              "age": _LADDER["age"]}
    rows = [(1, "11111", 31), (2, "11111", 39),
            (3, "11111", 57), (4, "11111", 52)]
    # level 0 singletons (ages distinct); level 1: zip stays 'zip'?? no -
    # zip's rung 1 is '*', age decades give groups of 2.
    out = _gen(spark, rows, ladder, k=2)
    assert out[1] == ("*", "30", 1)
    assert out[3] == ("*", "50", 1)


def test_mode_tie_break_prefers_smallest_value(spark):
    # Two priorities tied at 2 occurrences within status 'A': the
    # lexicographically smaller one must win deterministically.
    from simple_anonymizer_spark.queries import QUERIES
    import tempfile, os

    rows = [
        (1, "A", "2-HIGH"), (2, "A", "2-HIGH"),
        (3, "A", "1-URGENT"), (4, "A", "1-URGENT"),
        (5, "A", "3-LOW"),
        (6, "B", "3-LOW"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(k, s, 100.0 + k, p) for k, s, p in rows],
            "o_orderkey long, o_orderstatus string, o_totalprice double,"
            " o_orderpriority string",
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r.o_orderstatus: r for r in
               QUERIES["agg_mode_disc_percentiles"](spark, d).collect()}
    assert out["A"].mode_priority == "1-URGENT"
    assert out["A"].n_orders == 5
    # discrete percentiles are actual data values at ceil(p*n)
    assert out["A"].p50_disc == 103.0   # 3rd of 5 sorted prices
    assert out["B"].p25_disc == out["B"].p50_disc == out["B"].p75_disc == 106.0


def test_gopher_quality_flags_each_rule(spark):
    """One crafted document per Gopher rule, plus a passing one — each
    fails EXACTLY its targeted rule (thresholds are inclusive integer
    cross-multiplications, pinned here at their boundaries)."""
    from simple_anonymizer_spark.operators import text_analysis

    good = "the be to of and that have with " * 7      # 56 words, mean 3.0
    docs = [
        (1, good.strip()),
        (2, "the be to of and that have with"),        # 8 words: too short
        (3, ("the be to of and that have with " * 7).strip()
            .replace("that", "####")),                  # hash-heavy
        (4, "\n".join("- " + good.strip() for _ in range(10))),   # bullets
        (5, "\n".join((good.strip() + ("..." if i < 5 else ""))
                      for i in range(10))),             # 50% ellipsis lines
        (6, ("10 20 30 40 50 60 70 80 90 99 " * 6).strip()
            + " the be"),                               # digits: low alpha
        (7, ("extraordinarily incomprehensible " * 30).strip()
            + " the be"),                               # mean wordlen > 10
        (8, "zebra quokka wombat numbat dingo koala bilby potoroo " * 7),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in
            text_analysis.gopher_quality_flags(df).collect()}

    assert rows[1].keep and rows[1].n_words == 56
    assert not rows[2].wordcount_ok and rows[2].mean_wordlen_ok
    assert not rows[3].symbol_ratio_ok and rows[3].wordcount_ok
    assert not rows[4].bullet_lines_ok and rows[4].stopwords_ok
    assert not rows[5].ellipsis_lines_ok and rows[5].bullet_lines_ok
    assert not rows[6].alpha_words_ok and rows[6].wordcount_ok
    assert not rows[7].mean_wordlen_ok
    assert not rows[8].stopwords_ok and rows[8].alpha_words_ok
    for d in (2, 3, 4, 5, 6, 7, 8):
        assert not rows[d].keep, d


# ---------------------------------------------------------------------------
# Mondrian k-anonymity (privacy.mondrian_anonymize)
# ---------------------------------------------------------------------------


def _mondrian_rows(n=120):
    # deterministic pseudo-random integers without random state
    return [(i, (i * 37) % 23, (i * 101) % 997) for i in range(n)]


def test_mondrian_k_guarantee_and_containment(spark):
    from simple_anonymizer_spark.operators.privacy import mondrian_anonymize

    rows = _mondrian_rows()
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = mondrian_anonymize(df, ["a", "b"], k=15, max_depth=4).collect()
    assert len(out) == len(rows)
    orig = {r[0]: (r[1], r[2]) for r in rows}
    for r in out:
        assert r.class_size >= 15
        a, b = orig[r.id]
        assert r.a_lo <= a <= r.a_hi
        assert r.b_lo <= b <= r.b_hi
    # depth 4 with n=120, k=15 must actually split (not one giant class)
    n_classes = len({(r.a_lo, r.a_hi, r.b_lo, r.b_hi) for r in out})
    assert n_classes > 1


def test_mondrian_partition_invariant(spark):
    from simple_anonymizer_spark.operators.privacy import mondrian_anonymize

    df = spark.createDataFrame(_mondrian_rows(80), "id long, a long, b long")
    a = sorted(map(tuple, mondrian_anonymize(
        df, ["a", "b"], k=10, max_depth=3).collect()))
    b = sorted(map(tuple, mondrian_anonymize(
        df.repartition(7), ["a", "b"], k=10, max_depth=3).collect()))
    assert a == b


def test_mondrian_k_exceeding_n_yields_single_class(spark):
    from simple_anonymizer_spark.operators.privacy import mondrian_anonymize

    df = spark.createDataFrame(_mondrian_rows(12), "id long, a long, b long")
    out = mondrian_anonymize(df, ["a", "b"], k=50, max_depth=3).collect()
    assert {(r.a_lo, r.a_hi, r.b_lo, r.b_hi) for r in out} == {
        (min(r[1] for r in _mondrian_rows(12)),
         max(r[1] for r in _mondrian_rows(12)),
         min(r[2] for r in _mondrian_rows(12)),
         max(r[2] for r in _mondrian_rows(12)))
    }
    assert all(r.class_size == 12 for r in out)


def test_mondrian_validation(spark):
    import pytest

    from simple_anonymizer_spark.operators.privacy import mondrian_anonymize

    df = spark.createDataFrame(_mondrian_rows(10), "id long, a long, b long")
    with pytest.raises(ValueError, match="QI"):
        mondrian_anonymize(df, [], k=2)
