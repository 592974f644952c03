"""FillForwardProcessor (the transformWithStateInPandas idiom, T1)
executed for REAL against a stub StatefulProcessorHandle.

The TWS *runtime* is env-blocked here (its state-server protocol needs
protobuf, absent from the container — see TESTS.md), but the
processor's own code — init, per-key pandas batch handling, ValueState
lifecycle across micro-batches, delete-clears-state — has no such
dependency. This test drives it with a hand-rolled ValueState and
asserts the output equal to the ``applyInPandasWithState`` twin
(streaming/fill_forward.py) on the same fixture, shrinking the
unverified TWS surface to exactly Spark's runtime wiring.

Reference semantics: DataStreamJob.java:60-102 (ValueState<String>
fill-forward; r/i/u store, sentinel replays state, d clears)."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import spark  # noqa: F401

from streaming_examples_spark.model.envelope import TOAST_SENTINEL
from streaming_examples_spark.streaming.stateful import FillForwardProcessor


class _StubValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _StubHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _StubValueState())


ROWS = [
    # (id, event_lsn, op, value)
    (1001, 10, "c", "a real biography"),
    (1001, 20, "u", TOAST_SENTINEL),
    (1001, 30, "u", "updated biography"),
    (1001, 40, "u", TOAST_SENTINEL),
    (1002, 15, "c", TOAST_SENTINEL),  # no prior value → stays null
    (1002, 25, "d", "x"),
    (1002, 35, "u", TOAST_SENTINEL),  # after delete: state cleared → null
]


def _run_tws_stub(batches_per_key: dict[int, list[list[tuple]]]) -> dict:
    """Drive FillForwardProcessor exactly as the TWS runtime would: one
    processor+handle per key partition, one handleInputRows call per
    micro-batch, state carried between calls via the handle."""
    got = {}
    for key, batches in batches_per_key.items():
        proc = FillForwardProcessor()
        proc.init(_StubHandle())
        for batch in batches:
            pdf = pd.DataFrame(batch, columns=["id", "event_lsn", "op", "value"])
            for out in proc.handleInputRows((key,), iter([pdf]), None):
                for _, r in out.iterrows():
                    got[(r["id"], r["event_lsn"])] = (
                        None if pd.isna(r["value"]) else r["value"]
                    )
        proc.close()
    return got


def test_tws_processor_matches_applyinpandas_twin(spark):
    """Single-batch-per-key drive equals the applyInPandasWithState
    twin on the same fixture — column for column."""
    from streaming_examples_spark.streaming.fill_forward import fill_forward_stream

    df = spark.createDataFrame(
        ROWS, "id long, event_lsn long, op string, value string"
    )
    twin = {
        (r["id"], r["event_lsn"]): r["value"]
        for r in fill_forward_stream(df, key_col="id", value_col="value").collect()
    }
    got = _run_tws_stub(
        {
            1001: [[r for r in ROWS if r[0] == 1001]],
            1002: [[r for r in ROWS if r[0] == 1002]],
        }
    )
    assert got == twin
    # and the semantics themselves, independently of the twin
    assert got[(1001, 20)] == "a real biography"
    assert got[(1001, 40)] == "updated biography"
    assert got[(1002, 15)] is None
    assert got[(1002, 35)] is None  # delete cleared the state


def test_tws_processor_state_survives_micro_batch_boundary():
    """The ValueState round-trip the runtime performs between batches:
    a sentinel arriving in a LATER handleInputRows call backfills from
    the value stored by the earlier one, and a delete in batch 2 clears
    state for batch 3."""
    k1 = [r for r in ROWS if r[0] == 1001]
    got = _run_tws_stub({1001: [k1[:2], k1[2:]]})  # split mid-key
    assert got[(1001, 20)] == "a real biography"  # within batch 1
    assert got[(1001, 40)] == "updated biography"  # within batch 2
    # sentinel as the FIRST row of batch 2 must read batch-1 state
    got2 = _run_tws_stub({1001: [k1[:1], [(1001, 20, "u", TOAST_SENTINEL)]]})
    assert got2[(1001, 20)] == "a real biography"
    # delete in batch 2 → batch 3 sentinel stays null
    got3 = _run_tws_stub(
        {
            1002: [
                [(1002, 10, "c", "real")],
                [(1002, 20, "d", "x")],
                [(1002, 30, "u", TOAST_SENTINEL)],
            ]
        }
    )
    assert got3[(1002, 30)] is None
