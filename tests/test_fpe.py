"""Format-preserving encryption semantics (anonymizers.fpe_digits):
exact decrypt inversion over the whole documented input space
(property-based), format/length preservation, key and tweak
sensitivity, fail-closed rejection, and the linear-plan shape."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from simple_anonymizer_spark.functions.anonymizers import fpe_digits

_digits = st.text(alphabet="0123456789", min_size=4, max_size=18)


def _roundtrip(spark, values, key="k", rounds=8, tweak_col=None):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "id long, pt string")
    if tweak_col:
        df = df.withColumn(tweak_col, F.col("id") % 2)
    enc = fpe_digits(df, "pt", "ct", key=key, rounds=rounds,
                     tweak_col=tweak_col)
    dec = fpe_digits(enc, "ct", "rt", key=key, rounds=rounds,
                     decrypt=True, tweak_col=tweak_col)
    return dec.orderBy("id").collect()


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_digits, min_size=1, max_size=8, unique=True))
def test_decrypt_inverts_encrypt_exactly(spark, values):
    for r in _roundtrip(spark, values):
        assert r.rt == r.pt, (r.pt, r.ct, r.rt)
        assert len(r.ct) == len(r.pt) and r.ct.isdigit()


@pytest.mark.parametrize("rounds", [1, 3, 8, 16])
def test_all_round_counts_invert(spark, rounds):
    vals = ["0000", "99999", "1234567890123456", "0" * 18, "42424"]
    for r in _roundtrip(spark, vals, rounds=rounds):
        assert r.rt == r.pt


def test_key_and_tweak_sensitivity(spark):
    df = spark.createDataFrame([(1, "1234567890123456")], "id long, pt string")
    c1 = fpe_digits(df, "pt", "ct", key="k1").first().ct
    c2 = fpe_digits(df, "pt", "ct", key="k2").first().ct
    assert c1 != c2
    # same digits, different length -> different tweak -> unrelated
    d2 = spark.createDataFrame([(1, "12345678")], "id long, pt string")
    c3 = fpe_digits(d2, "pt", "ct", key="k1").first().ct
    assert c3 != c1[:8]
    # tweak_col round-trips and changes ciphertext
    rows = _roundtrip(spark, ["777777777", "777777777"], tweak_col="tw")
    assert rows[0].rt == rows[0].pt and rows[1].rt == rows[1].pt
    assert rows[0].ct != rows[1].ct  # id%2 differs -> tweak differs


def test_deterministic_and_injective_per_length(spark):
    vals = [str(1000 + i) for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "pt string")
    enc1 = {r.pt: r.ct for r in fpe_digits(df, "pt", "ct", "k").collect()}
    enc2 = {r.pt: r.ct for r in fpe_digits(df, "pt", "ct", "k").collect()}
    assert enc1 == enc2                       # deterministic
    assert len(set(enc1.values())) == 500     # a permutation: no collisions


def test_nonconforming_inputs_fail_closed(spark):
    bad = ["123", "1" * 19, "12a4", "", " 1234", "12.45", None]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(bad)],
                               "id long, pt string")
    out = fpe_digits(df, "pt", "ct", "k").orderBy("id").collect()
    assert all(r.ct is None for r in out)


def test_rounds_bound_validated(spark):
    df = spark.createDataFrame([("1234",)], "pt string")
    with pytest.raises(ValueError):
        fpe_digits(df, "pt", "ct", "k", rounds=0)
    with pytest.raises(ValueError):
        fpe_digits(df, "pt", "ct", "k", rounds=17)


def test_plan_is_linear_maponly(spark):
    df = spark.createDataFrame([("1234567890123456",)], "pt string")
    enc = fpe_digits(df, "pt", "ct", "k")
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # linear growth: the 8-round chain must not explode the plan text
    # the way Fibonacci column-nesting would (~34x the PRF subtree)
    assert plan.count("md5") <= 8 + 2