"""Hypothesis property tests: value-object validation boundaries and
ETL-operator algebraic invariants (reference test model:
tests/unit/domain/test_value_objects.py exercises the same boundaries
example-by-example)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lime_etl_spark.domain.batch_delta import BatchDelta
from lime_etl_spark.domain.value_objects import (
    BatchName,
    ExecutionMillis,
    JobName,
    MaxRetries,
    Result,
    TimeoutSeconds,
    UniqueId,
)

# ---------------------------------------------------------------------------
# value objects (pure python — full hypothesis example counts)
# ---------------------------------------------------------------------------


@given(st.text(min_size=3, max_size=199))
def test_job_name_accepts_in_range(s):
    assert JobName(s).value == s


@given(st.text(max_size=2))
def test_job_name_rejects_short(s):
    with pytest.raises(ValueError):
        JobName(s)


@given(st.text(min_size=200, max_size=260))
def test_job_name_rejects_long(s):
    with pytest.raises(ValueError):
        BatchName(s)


@given(st.integers(min_value=0, max_value=2**31))
def test_nonnegative_ints_accept(n):
    assert MaxRetries(n).value == n
    assert ExecutionMillis(n).value == n


@given(st.integers(max_value=-1))
def test_nonnegative_ints_reject_negative(n):
    with pytest.raises(ValueError):
        MaxRetries(n)


@given(st.one_of(st.none(), st.integers(min_value=0)))
def test_timeout_optional(n):
    assert TimeoutSeconds(n).value == n


def test_unique_id_generate_roundtrip():
    for _ in range(50):
        uid = UniqueId.generate()
        assert UniqueId(uid.value) == uid


@given(st.text(min_size=1, max_size=500))
def test_result_failure_holds_message(msg):
    r = Result.failure(msg)
    assert r.is_failure and not r.is_success
    assert r.failure_message_or_none == msg


# ---------------------------------------------------------------------------
# batch delta set algebra
# ---------------------------------------------------------------------------

_names = st.sets(st.sampled_from([f"job_{i}" for i in range(8)]))


class _FakeStatus:
    def __init__(self, jobs, broken):
        self._jobs, self._broken = set(jobs), set(broken)

    @property
    def job_names(self):
        return self._jobs

    @property
    def broken_jobs(self):
        return self._broken


@given(_names, _names, _names, _names)
def test_batch_delta_algebra(cur_jobs, cur_broken, prev_jobs, prev_broken):
    cur = _FakeStatus(cur_jobs | cur_broken, cur_broken)
    prev = _FakeStatus(prev_jobs | prev_broken, prev_broken)
    d = BatchDelta(current=cur, previous=prev)
    assert d.common_jobs == cur.job_names & prev.job_names
    assert d.newly_broken_jobs == cur.broken_jobs - prev.broken_jobs
    assert d.newly_fixed_jobs == prev.broken_jobs - cur.broken_jobs
    # nothing can be both newly broken and newly fixed
    assert not (d.newly_broken_jobs & d.newly_fixed_jobs)


# ---------------------------------------------------------------------------
# ETL operator invariants (Spark-backed — few, large examples)
# ---------------------------------------------------------------------------

_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=100)),
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=_rows, inc=_rows)
def test_upsert_invariants(spark, base, inc):
    from lime_etl_spark.operators.etl import upsert

    schema = "k int, v int"
    base_df = spark.createDataFrame(base, schema)
    inc_df = spark.createDataFrame([(k, v) for k, v in dict(inc).items()], schema)
    out = {r["k"]: r["v"] for r in upsert(base_df, inc_df, ["k"]).collect()}
    # keys = union; increment wins on collision
    assert set(out) == {k for k, _ in base} | {k for k, _ in inc}
    for k, v in dict(inc).items():
        assert out[k] == v


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=_rows, new=_rows)
def test_snapshot_diff_partitions_key_space(spark, old, new):
    from lime_etl_spark.operators.etl import snapshot_diff

    schema = "k int, v int"
    old_d, new_d = dict(old), dict(new)
    old_df = spark.createDataFrame(list(old_d.items()), schema)
    new_df = spark.createDataFrame(list(new_d.items()), schema)
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old_df, new_df, ["k"]).collect()}
    assert set(got) == set(old_d) | set(new_d)
    for k, ct in got.items():
        if k not in old_d:
            assert ct == "added"
        elif k not in new_d:
            assert ct == "deleted"
        elif old_d[k] != new_d[k]:
            assert ct == "changed"
        else:
            assert ct == "unchanged"


_cdc_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),          # key
        st.integers(min_value=1, max_value=9),           # seq
        st.sampled_from(["I", "U", "D"]),                # op
        st.integers(min_value=0, max_value=100),         # value
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=_rows, ops=_cdc_ops)
def test_cdc_apply_matches_sequential_replay(spark, base, ops):
    """cdc_apply (set-oriented, one pass) must equal the obvious
    sequential interpretation: replay ops in seq order per key, drop
    keys whose LAST op is a delete."""
    from lime_etl_spark.operators.etl import cdc_apply

    base_d = dict(base)
    # one op per (key, seq): latest-listed wins inside a slot to keep
    # the reference well-defined, mirroring dropDuplicates semantics
    slots = {(k, s): (op, v) for k, s, op, v in ops}
    expected = dict(base_d)
    for k in {k for k, _ in slots}:
        seqs = sorted(s for kk, s in slots if kk == k)
        op, v = slots[(k, seqs[-1])]
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v

    base_df = spark.createDataFrame(list(base_d.items()), "k int, v int")
    chg_rows = [(k, s, op, v) for (k, s), (op, v) in slots.items()]
    chg_df = spark.createDataFrame(chg_rows, "k int, seq int, op string, v int")
    got = {r["k"]: r["v"] for r in cdc_apply(base_df, chg_df, ["k"]).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(st.integers(1, 30), st.integers(1, 15)),
        min_size=1,
        max_size=25,
    )
)
def test_skyline_chain_equals_dominance_definition(spark, pts):
    """The monotone-chain skyline window (q_skyline_parts shape) must
    equal the O(n²) dominance definition on random (price, size)
    sets, including duplicate points (mutually non-dominating)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]

    def dominated(i, p, s):
        return any(
            p2 <= p and s2 <= s and (p2 < p or s2 < s)
            for j, p2, s2 in rows
            if j != i
        )

    expected = {i for i, p, s in rows if not dominated(i, p, s)}

    df = spark.createDataFrame(rows, "id int, price bigint, size int")
    w_cheaper = Window.orderBy("price").rangeBetween(Window.unboundedPreceding, -1)
    w_same = Window.partitionBy("price")
    scanned = df.select(
        "id",
        "price",
        "size",
        F.min("size").over(w_cheaper).alias("mc"),
        F.min("size").over(w_same).alias("ms"),
    )
    got = {
        r.id
        for r in scanned.where(
            (F.col("mc").isNull() | (F.col("size") < F.col("mc")))
            & (F.col("size") <= F.col("ms"))
        ).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=0,
        max_size=20,
    ),
    k=st.integers(2, 3),
)
def test_kcore_equals_reference_peeling(spark, edges, k):
    """Distributed k_core must equal sequential peeling on random
    graphs (the k-core is unique, so any peeling order agrees)."""
    from lime_etl_spark.operators.insights2 import k_core

    vids = sorted({v for e in edges for v in e}) or [1]
    adj = {v: set() for v in vids}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(vids)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if len(adj[v] & alive) < k:
                alive.discard(v)
                changed = True
    vs = spark.createDataFrame([(v,) for v in vids], ["vid"])
    es = spark.createDataFrame(edges or [(1, 1)], ["src", "dst"]).where("src <> dst")
    got = {r.vid for r in k_core(vs, es, k=k).collect()}
    assert got == alive
