"""Property-based check of the MERGE kernel: random insert/update/delete
sequences, split into random epochs, applied through both write modes, must
always equal a trivial driver-side dict fold (last op per key wins)."""

from __future__ import annotations

import datetime
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable

TS = datetime.datetime(2025, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),                 # conv
        st.integers(0, 3),                 # turn
        st.sampled_from(["I", "U", "D"]),
        st.text(alphabet="abßc🦜 ", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=60,
)


def _fold(events):
    state = {}
    for seq, (c, t, op, text) in enumerate(events):
        key = (f"c{c}", t)
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = text
    return {k: v for k, v in state.items()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, n_epochs=st.integers(1, 3),
       mode=st.sampled_from(["cow", "mor"]))
def test_apply_equals_dict_fold(spark, events, n_epochs, mode):
    with tempfile.TemporaryDirectory() as d:
        table = LakeTable.create(
            spark, f"{d}/t", TRANSCRIPTS_SCHEMA_V1, bucket_key="conv_id", n_buckets=4
        )
        rows = [
            (f"c{c}", t, "user", text, None, TS, seq, op)
            for seq, (c, t, op, text) in enumerate(events)
        ]
        chunk = max(1, len(rows) // n_epochs)
        for i in range(0, len(rows), chunk):
            df = spark.createDataFrame(
                rows[i:i + chunk],
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp, seq long, op string",
            )
            table.apply_cdc_stats(
                df, key_cols=["conv_id", "turn_idx"], op_col="op", seq_col="seq",
                write_mode=mode, compact_threshold=2,
            )
        got = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in table.read().collect()
        }
        assert got == _fold(events)
