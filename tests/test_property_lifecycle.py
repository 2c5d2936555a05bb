"""Property-based state-machine check of the FULL LakeTable lifecycle:
random interleavings of merge / compact / rebucket / add+drop columns /
vacuum must always equal a trivial driver-side dict fold. The merge kernel
alone is fuzzed in test_property_merge; this fuzzes the maintenance and
evolution operations AROUND it — the interactions (drop during MoR deltas,
rebucket mid-stream, vacuum after rewrite) are where state machines rot."""

from __future__ import annotations

import datetime
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable

TS = datetime.datetime(2025, 1, 1)

BASE_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
])

# an op is either a merge batch (list of events) or a maintenance action
merge_batch = st.lists(
    st.tuples(
        st.integers(0, 3),                  # conv
        st.integers(0, 2),                  # turn
        st.sampled_from(["U", "U", "D"]),   # upsert-heavy mix
        st.text(alphabet="abz🦜", min_size=0, max_size=6),
    ),
    min_size=1, max_size=12,
)
action = st.one_of(
    st.tuples(st.just("merge"), merge_batch),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("rebucket"), st.integers(2, 6)),
    st.tuples(st.just("addcol"), st.none()),
    st.tuples(st.just("dropcol"), st.none()),
    st.tuples(st.just("vacuum"), st.none()),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(actions=st.lists(action, min_size=2, max_size=8),
       mode=st.sampled_from(["cow", "mor"]))
def test_lifecycle_equals_dict_fold(spark, actions, mode):
    with tempfile.TemporaryDirectory() as d:
        table = LakeTable.create(
            spark, f"{d}/t", BASE_SCHEMA, bucket_key="conv_id", n_buckets=4
        )
        state: dict = {}      # (conv, turn) -> text — the oracle
        extra_live = False    # is the evolvable "tool" column currently live?
        seq = 0
        for kind, arg in actions:
            if kind == "merge":
                rows = []
                for c, t, op, text in arg:
                    rows.append((f"c{c}", t, text, op, seq))
                    key = (f"c{c}", t)
                    if op == "D":
                        state.pop(key, None)
                    else:
                        state[key] = text
                    seq += 1
                src_schema = T.StructType(
                    list(BASE_SCHEMA.fields)
                    + [T.StructField("op", T.StringType()),
                       T.StructField("seq", T.LongType())]
                )
                src = spark.createDataFrame(rows, src_schema)
                table.apply_cdc_stats(
                    src, key_cols=["conv_id", "turn_idx"], op_col="op",
                    seq_col="seq", write_mode=mode, compact_threshold=2,
                )
            elif kind == "compact":
                table.compact()
            elif kind == "rebucket":
                table.rebucket(arg)
            elif kind == "addcol":
                try:
                    table.add_columns([T.StructField("tool", T.StringType())])
                    extra_live = True
                except ValueError:
                    pass  # tombstoned from an earlier drop — legal refusal
            elif kind == "dropcol":
                if extra_live:
                    table.drop_columns(["tool"])
                    extra_live = False
            elif kind == "vacuum":
                table.vacuum(keep_last=1)

        got = {
            (r.conv_id, r.turn_idx): r.text
            for r in table.read().collect()
        }
        assert got == state
        # schema reflects the evolution history
        assert ("tool" in [f.name for f in table.snapshot().schema.fields]) == extra_live
        # and the table still accepts one more merge after any interleaving
        src_schema = T.StructType(
            list(table.snapshot().schema.fields)
            + [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
        )
        ncols = len(table.snapshot().schema.fields)
        probe = spark.createDataFrame(
            [tuple(["cz", 9, "final"] + [None] * (ncols - 3) + ["U", seq])],
            src_schema,
        )
        table.apply_cdc_stats(probe, key_cols=["conv_id", "turn_idx"],
                              op_col="op", seq_col="seq", write_mode=mode,
                              compact_threshold=2)
        state[("cz", 9)] = "final"
        got2 = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
        assert got2 == state
