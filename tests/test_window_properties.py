"""Property-based tests for the window/join family (hypothesis):
as-of join and sessionization replayed by independent single-threaded
Python over random event histories. The fixed-scenario tests pin the
designed edge cases; these sweep the input space for frame/ordering
bugs (wrong inclusivity, tie-break drift, gap boundary off-by-one)
the hand-picked rows can't reach.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import spark  # noqa: F401

UTC = dt.timezone.utc


@pytest.mark.slow
def test_asof_join_matches_reference_on_random_histories(spark):
    """Property: for every left row, asof_join returns exactly the
    LATEST right row with right_ts <= left_ts for its key (None when
    no such row), never mixing columns across right rows. Right
    timestamps are unique per key — with duplicates the 'latest row'
    is not well-defined and the operator makes no ordering promise."""
    from streaming_examples_spark.operators.asof import asof_join

    @settings(max_examples=5, deadline=None)
    @given(data=st.data())
    def check(data):
        n_keys = data.draw(st.integers(1, 3))
        left = data.draw(
            st.lists(
                st.tuples(
                    st.integers(0, n_keys - 1),  # key
                    st.integers(0, 50),  # left ts
                ),
                min_size=1,
                max_size=30,
            )
        )
        # unique (key, ts) pairs on the right: per-key unique timestamps
        right = data.draw(
            st.lists(
                st.tuples(st.integers(0, n_keys - 1), st.integers(0, 50)),
                min_size=0,
                max_size=30,
                unique=True,
            )
        )
        left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
        right_rows = [(k, t, k * 1000 + t) for k, t in right]

        ldf = spark.createDataFrame(left_rows, "lid long, k long, lts long")
        rdf = spark.createDataFrame(right_rows, "k long, rts long, v long")
        got = {
            r["lid"]: r["v_asof"]
            for r in asof_join(
                ldf, rdf, on=["k"], left_ts="lts", right_ts="rts", right_cols=["v"]
            ).collect()
        }

        for lid, k, lts in left_rows:
            matches = [(t, v) for kk, t, v in right_rows if kk == k and t <= lts]
            want = max(matches)[1] if matches else None
            assert got[lid] == want, (lid, k, lts, matches)

    check()


@pytest.mark.slow
def test_sessionize_matches_reference_on_random_streams(spark):
    """Property: gaps-and-islands sessionization agrees with a
    single-threaded replay on random per-user event streams — same
    session boundaries (gap STRICTLY greater than the threshold
    splits), counts, start/end, and value sums. Ties in ts are broken
    by event_id on both sides."""
    from pyspark.sql import functions as F

    from streaming_examples_spark.operators.windows import sessionize

    @settings(max_examples=5, deadline=None)
    @given(
        events=st.lists(
            st.tuples(
                st.integers(0, 2),  # user
                st.integers(0, 7200),  # ts offset seconds (0-2h)
                st.integers(0, 100),  # value cents
            ),
            min_size=1,
            max_size=40,
        ),
        gap_minutes=st.sampled_from([1.0, 5.0, 30.0]),
    )
    def check(events, gap_minutes):
        base = dt.datetime(2026, 1, 1, tzinfo=UTC)
        rows = [
            (i, u, base + dt.timedelta(seconds=s), c / 100.0)
            for i, (u, s, c) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        # compare epoch seconds, not collected datetimes: PySpark's
        # non-Arrow collect converts TimestampType through the OS-local
        # zone, so naive results only equal the UTC reference when the
        # machine happens to run in UTC
        sess = sessionize(df, gap_minutes=gap_minutes).select(
            "user_id",
            "session_seq",
            "n_events",
            F.col("session_start").cast("double").alias("ss"),
            F.col("session_end").cast("double").alias("se"),
            "session_value",
        )
        got = {
            (r["user_id"], r["session_seq"]): (
                r["n_events"],
                r["ss"],
                r["se"],
                r["session_value"],
            )
            for r in sess.collect()
        }

        want = {}
        for u in {r[1] for r in rows}:
            stream = sorted(
                ((ts, eid, v) for eid, uu, ts, v in rows if uu == u),
                key=lambda x: (x[0], x[1]),
            )
            seq, prev = 0, None
            sessions: dict[int, list] = {}
            for ts, eid, v in stream:
                if prev is None or (ts - prev).total_seconds() > gap_minutes * 60:
                    seq += 1
                sessions.setdefault(seq, []).append((ts, v))
                prev = ts
            for s, evs in sessions.items():
                total = sum(v for _, v in evs)
                want[(u, s)] = (
                    len(evs),
                    min(ts for ts, _ in evs).timestamp(),
                    max(ts for ts, _ in evs).timestamp(),
                    int(total * 100 + 0.5) / 100.0,
                )
        assert got == want

    check()


@pytest.mark.slow
def test_upsert_materialization_matches_reference_on_random_cdc(spark):
    """Property: as_upsert over a random but causally-valid CDC
    history (inserts of absent keys, updates/deletes of present ones,
    re-inserts after delete, monotone LSNs) equals a dict replay's
    final state — latest event per key decides presence and value,
    tombstones remove. Also checks the upsert→changelog→upsert
    roundtrip reproduces the same final table."""
    import random

    from streaming_examples_spark.operators.ingest import (
        as_upsert,
        changelog_to_upsert,
        upsert_to_changelog,
    )
    from pyspark.sql import functions as F

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=5, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1), n_events=st.integers(1, 60))
    def check(seed, n_events):
        rng = random.Random(seed)
        state: dict[int, int] = {}
        events = []
        for lsn in range(1, n_events + 1):
            choices = ["c"] + (["u", "d"] if state else [])
            op = rng.choice(choices)
            if op == "c":
                free = [k for k in range(6) if k not in state]
                if not free:
                    op = "u"
            if op == "c":
                k, v = rng.choice(free), rng.randint(0, 999)
                events.append(("c", None, {"id": k, "val": v}, {"lsn": lsn}, lsn))
                state[k] = v
            elif op == "u":
                k, v = rng.choice(list(state)), rng.randint(0, 999)
                events.append(
                    ("u", {"id": k, "val": state[k]}, {"id": k, "val": v}, {"lsn": lsn}, lsn)
                )
                state[k] = v
            else:
                k = rng.choice(list(state))
                events.append(("d", {"id": k, "val": state[k]}, None, {"lsn": lsn}, lsn))
                del state[k]

        schema = (
            "op string, before struct<id:long,val:long>, "
            "after struct<id:long,val:long>, source struct<lsn:long>, ts_ms long"
        )
        df = spark.createDataFrame(events, schema)
        got = {r["id"]: r["val"] for r in as_upsert(df, ["id"]).collect()}
        assert got == state

        # roundtrip: per-key version snapshots -> retract changelog ->
        # upsert again; the final table must survive both conversions
        snaps = df.select(
            F.coalesce(F.col("after.id"), F.col("before.id")).alias("id"),
            F.col("ts_ms").alias("ver"),
            F.col("after").alias("row"),  # null after = tombstone
        )
        cl = upsert_to_changelog(snaps, ["id"], "ver").select(
            "row_kind",
            "row",
            F.struct(F.col("ver").alias("lsn")).alias("source"),
            F.col("ver").alias("ts_ms"),
        )
        back = {r["id"]: r["val"] for r in changelog_to_upsert(cl, ["id"]).collect()}
        assert back == state

    check()


@pytest.mark.slow
def test_fill_forward_rows_and_range_match_reference(spark):
    """Property: both fill-forward variants agree with a
    single-threaded replay on random sparse streams (unique ts per
    key, where peer order is well-defined): the rows frame carries the
    last non-null forever; the RANGE frame forgets it after `days` of
    silence — including the boundary (exactly `days` old still
    fills)."""
    from pyspark.sql import functions as F

    from streaming_examples_spark.operators.windows import (
        fill_forward,
        fill_forward_range,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 2),  # key
                st.integers(0, 4 * 86400),  # ts offset sec (0-4 days)
                st.one_of(st.none(), st.integers(0, 99)),  # sparse value
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: (t[0], t[1]),  # unique ts per key
        ),
        days=st.sampled_from([1, 2]),
    )
    def check(rows, days):
        base = dt.datetime(2026, 1, 1, tzinfo=UTC)
        data = [
            (i, k, base + dt.timedelta(seconds=s), v)
            for i, (k, s, v) in enumerate(rows)
        ]
        df = spark.createDataFrame(data, "rid long, k long, ts timestamp, v long")
        ff = fill_forward(df, ["k"], ["ts"], F.col("v"), "filled")
        fr = fill_forward_range(df, ["k"], "ts", F.col("v"), "filled", days=days)
        got_rows = {r["rid"]: r["filled"] for r in ff.collect()}
        got_range = {r["rid"]: r["filled"] for r in fr.collect()}

        for k in {d[1] for d in data}:
            stream = sorted(
                ((ts, rid, v) for rid, kk, ts, v in data if kk == k)
            )
            last, last_ts = None, None
            for ts, rid, v in stream:
                if v is not None:
                    last, last_ts = v, ts
                assert got_rows[rid] == last
                in_range = (
                    last is not None
                    and (ts - last_ts).total_seconds() <= days * 86400
                )
                assert got_range[rid] == (last if in_range else None), (
                    rid, k, ts, last, last_ts, days,
                )

    check()


@pytest.mark.slow
def test_changelog_aggregate_matches_final_state_on_random_histories(spark):
    """Property: the signed one-pass changelog aggregate equals
    aggregating the final materialized state, for every random valid
    retraction stream (+I, -U/+U pairs, -D; values in exact cents) —
    the consistency contract that lets the single-shuffle plan replace
    upsert-then-aggregate."""
    import random

    from pyspark.sql import functions as F

    from streaming_examples_spark.operators.ingest import changelog_aggregate

    @settings(max_examples=5, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1), n_ops=st.integers(1, 80))
    def check(seed, n_ops):
        rng = random.Random(seed)
        live: dict[int, int] = {}  # key -> cents
        rows = []  # (row_kind, group, value)

        def emit(kind, key, cents):
            rows.append((kind, key % 3, cents / 100.0))

        for _ in range(n_ops):
            op = rng.choice(["i"] + (["u", "d"] if live else []))
            if op == "i":
                free = [k for k in range(8) if k not in live]
                if not free:
                    op = "u"
            if op == "i":
                k, c = rng.choice(free), rng.randint(0, 9999)
                emit("+I", k, c)
                live[k] = c
            elif op == "u":
                k, c = rng.choice(list(live)), rng.randint(0, 9999)
                emit("-U", k, live[k])
                emit("+U", k, c)
                live[k] = c
            else:
                k = rng.choice(list(live))
                emit("-D", k, live[k])
                del live[k]

        df = spark.createDataFrame(rows, "row_kind string, g int, v double")
        got = {
            r["g"]: (r["n_live"], r["sum_value_cents"])
            for r in changelog_aggregate(df, [F.col("g")], F.col("v")).collect()
        }
        want: dict[int, list[int]] = {}
        for k, c in live.items():
            want.setdefault(k % 3, [0, 0])
            want[k % 3][0] += 1
            want[k % 3][1] += c
        # groups whose every row retracted still appear with zeros on
        # the aggregate side (they had events); fold them in
        for g, (n, s) in got.items():
            assert (n, s) == tuple(want.get(g, [0, 0])), (g, got, want)

    check()


def test_writer_lock_released_when_critical_section_raises(tmp_path):
    """The lock must not survive a failed batch: an exception inside
    the critical section releases it (and only our own lock file —
    ownership verified by inode)."""
    import os

    from streaming_examples_spark.streaming.locks import writer_lock

    state = str(tmp_path / "state")
    with pytest.raises(ValueError, match="boom"):
        with writer_lock(state, "t"):
            assert os.path.exists(os.path.join(state, "_writer.lock"))
            raise ValueError("boom")
    assert not os.path.exists(os.path.join(state, "_writer.lock"))
    with writer_lock(state, "t"):  # and it is re-acquirable
        pass


@pytest.mark.slow
def test_event_ranks_matches_reference_on_random_streams(spark):
    """Property: the single-window rank/lag/running-total operator
    agrees with a per-user sequential replay (exact-cent values, so
    the 2-decimal rounding is engine-portable)."""
    from hypothesis import given as _given

    from streaming_examples_spark.operators.windows import event_ranks

    @settings(max_examples=5, deadline=None)
    @_given(
        events=st.lists(
            st.tuples(
                st.integers(0, 2),  # user
                st.integers(0, 1000),  # ts seconds
                st.integers(0, 9999),  # cents
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(events):
        base = dt.datetime(2026, 1, 1, tzinfo=UTC)
        rows = [
            (i, u, base + dt.timedelta(seconds=s), "click", c / 100.0)
            for i, (u, s, c) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
        )
        got = {
            r["event_id"]: (r["seq"], r["value_delta"], r["running_value"])
            for r in event_ranks(df).collect()
        }
        for u in {r[1] for r in rows}:
            stream = sorted(
                ((ts, eid, v) for eid, uu, ts, _, v in rows if uu == u),
                key=lambda x: (x[0], x[1]),
            )
            prev, running = 0.0, 0.0
            for i, (ts, eid, v) in enumerate(stream):
                running += v
                want = (i + 1, round(v - prev, 2), round(running, 2))
                assert got[eid] == want, (eid, got[eid], want)
                prev = v

    check()
