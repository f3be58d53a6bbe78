"""Property-based check of the fake Postgres against a pure-Python model.

The product's write pattern — batched INSERT [ON CONFLICT] inside
per-partition transactions, rollback on failure — is replayed as random
transaction sequences; the fake's committed state must equal a dict
model applying PG semantics (conflict without a policy aborts the whole
transaction; DO NOTHING skips; DO UPDATE overwrites; rollback discards)."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simple_anonymizer_spark.plans.on_conflict import OnConflict
from simple_anonymizer_spark.sources.fakepg import FakePostgres, IntegrityError
from simple_anonymizer_spark.sources.jdbc import render_insert

POLICIES = {
    "none": None,
    "nothing": OnConflict.do_nothing(),
    "update": OnConflict.do_update(),
}

txn_strategy = st.tuples(
    st.sampled_from(sorted(POLICIES)),
    st.lists(
        st.tuples(st.integers(0, 7), st.text("abcxyz", min_size=0, max_size=4)),
        min_size=0, max_size=6,
    ),
    st.booleans(),  # commit (True) or rollback (False)
)


def model_apply(committed: dict, policy_name: str, rows, do_commit: bool) -> dict:
    work = dict(committed)
    for i, v in rows:
        if i in work:
            if policy_name == "none":
                return committed  # execute raises -> transaction rolled back
            if policy_name == "update":
                work[i] = v
            # nothing: skip
        else:
            work[i] = v
    return work if do_commit else committed


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(txn_strategy, min_size=0, max_size=6))
def test_fakepg_matches_model(txns):
    db = FakePostgres(tempfile.mktemp(prefix="fakepg_prop_"))
    db.create_table("t", [("id", "integer"), ("v", "varchar(10)")],
                    primary_key=["id"])

    committed: dict[int, str] = {}
    for policy_name, rows, do_commit in txns:
        sql = render_insert("t", ["id", "v"],
                            on_conflict=POLICIES[policy_name],
                            primary_key=["id"])
        conn = db.connect()
        try:
            conn.cursor().executemany(sql, rows)
            if do_commit:
                conn.commit()
            else:
                conn.rollback()
        except IntegrityError:
            conn.rollback()
        finally:
            conn.close()
        committed = model_apply(committed, policy_name, rows, do_commit)

        got = {r["id"]: r["v"] for r in db.dump("t")}
        assert got == committed, (policy_name, rows, do_commit)
