"""Fixture-schema drift guard.

The driver regenerates /root/testdata between rounds and has already shipped
the events ``ts`` column in two different physical encodings (int64 nanos in
round 1, timestamp[us] / TIMESTAMP_NTZ in round 2 — the latter silently broke
10 queries and the bench). This test re-encodes a small events table in every
physical ``ts`` encoding the driver has used or could plausibly use, and
asserts every events-consuming query analyzes AND produces identical results
under all of them. A future fixture regeneration flips this test, not a round.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from simple_anonymizer_spark.queries import QUERIES

EVENTS_QUERIES = [
    "events_tumbling",
    "events_sliding",
    "events_sessionize",
    "events_asof_signup",
    "events_interval_join",
    "funnel_signup_purchase",
    "funnel_three_step",
    "cohort_retention_weekly",
    "scd2_user_state",
    "rolling_user_activity",
    "window_running_distinct",
]

ENCODINGS = ["ts_nanos_int64", "ts_us_ntz", "ts_us_utc"]


def _reencode(table: pa.Table, encoding: str) -> pa.Table:
    ts = table.column("ts")
    idx = table.schema.get_field_index("ts")
    if encoding == "ts_us_ntz":
        cast = ts.cast(pa.timestamp("us"))
    elif encoding == "ts_us_utc":
        cast = ts.cast(pa.timestamp("us", tz="UTC"))
    elif encoding == "ts_nanos_int64":
        # round-1 physical form: timestamp[ns], which Spark reads as bigint
        # under spark.sql.legacy.parquet.nanosAsLong
        cast = ts.cast(pa.timestamp("ns"))
    else:  # pragma: no cover
        raise AssertionError(encoding)
    return table.set_column(idx, pa.field("ts", cast.type), cast)


@pytest.fixture(scope="module")
def drift_dirs(sf_dir, tmp_path_factory):
    """One sf-dir per encoding: re-encoded events + symlinks to the rest."""
    base = tmp_path_factory.mktemp("drift")
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    dirs = {}
    for enc in ENCODINGS:
        d = base / enc
        d.mkdir()
        pq.write_table(
            _reencode(table, enc),
            str(d / "events.parquet"),
            # keep ns physical: pyarrow >= 13 writes ns natively with 2.6
            coerce_timestamps=None,
            version="2.6",
        )
        for name in os.listdir(sf_dir):
            if name != "events.parquet":
                os.symlink(os.path.join(sf_dir, name), str(d / name))
        dirs[enc] = str(d)
    return dirs


def _rows(spark, sf, qname):
    df = QUERIES[qname](spark, sf)
    return sorted(
        tuple(r) for r in df.collect()
    ), [f.name for f in df.schema.fields]


@pytest.mark.parametrize("qname", EVENTS_QUERIES)
def test_events_queries_invariant_to_ts_encoding(spark, drift_dirs, qname):
    baseline_rows, baseline_cols = _rows(spark, drift_dirs["ts_us_utc"], qname)
    assert baseline_rows, f"{qname} returned no rows at sf0.001"
    for enc in ENCODINGS:
        if enc == "ts_us_utc":
            continue
        rows, cols = _rows(spark, drift_dirs[enc], qname)
        assert cols == baseline_cols, f"{qname}: schema drift under {enc}"
        assert rows == baseline_rows, f"{qname}: value drift under {enc}"
