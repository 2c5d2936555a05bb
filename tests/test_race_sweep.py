"""Race-at-every-publish sweep: a compactor commits first, every time.

Complement to tests/test_crash_sweep.py. There, the writer DIES at each
metadata mutation; here it LOSES a commit race at each publish instead: a
concurrent maintenance job (MoR compaction through a second LakeTable
handle — content-preserving, so the fold oracle still defines the truth)
publishes immediately before every conditional PUT the engine attempts.

The engine must then either rebase its commit onto the competitor's
snapshot (the optimistic-concurrency loop in LakeTable._rebase_commit) or
abort cleanly with CommitConflict — and in both cases a follow-up clean
engine run must land the exact oracle state with every epoch applied
exactly once. The reference never faces this (DataX jobs assume an
exclusive sink); a shared lake table at production scale faces it on
every epoch that overlaps a compaction, clustering, or vacuum window.
"""

from __future__ import annotations

import os

from datax_spark.cdc.engine import CdcEngine, EngineConfig
from datax_spark.lake.fs import LocalFS
from datax_spark.lake.table import CommitConflict, LakeTable
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1

from tests.test_crash_sweep import (
    _assert_recovered_exactly_once,
    _feed,
)


class RaceFS(LocalFS):
    """LocalFS that lets a competitor publish first at the Nth conditional
    publish. race_at=None only counts publishes (the dry run)."""

    def __init__(self, race_at: int | None = None, competitor=None):
        self.publishes = 0
        self.race_at = race_at
        self.competitor = competitor
        self.raced_on: str | None = None

    def publish_atomic(self, path: str, content: str) -> None:
        self.publishes += 1
        if self.race_at is not None and self.publishes == self.race_at \
                and self.raced_on is None:
            self.raced_on = os.path.basename(path)
            self.competitor()
        super().publish_atomic(path, content)


def test_race_sweep_compaction_wins_every_publish(spark, tmp_path):
    feed = _feed(spark, tmp_path, shards=8)

    def run(race_at: int | None):
        tag = "dry" if race_at is None else f"r{race_at}"
        root = str(tmp_path / f"{tag}-table")
        ckpt = str(tmp_path / f"{tag}-ckpt")
        LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, "conv_id",
                         n_buckets=8, fs=LocalFS())

        def compact_now():
            # a second, independent handle — the maintenance job's view
            LakeTable(spark, root, fs=LocalFS()).compact()

        fs = RaceFS(race_at=race_at, competitor=compact_now)
        eng = CdcEngine(
            spark,
            EngineConfig(table_root=root, feed_dir=feed,
                         checkpoint_dir=ckpt),
            fs=fs,
        )
        conflicted = False
        try:
            eng.run()
        except CommitConflict:
            conflicted = True  # clean abort is allowed; silent loss is not
        return fs, root, ckpt, conflicted

    dry, root0, ckpt0, _ = run(None)
    total = dry.publishes
    assert total > 10, f"only {total} publish points"
    _assert_recovered_exactly_once(spark, feed, root0, ckpt0)

    failures = []
    outcomes = {"rebased": 0, "conflicted": 0}
    for n in range(1, total + 1):
        fs, root, ckpt, conflicted = run(n)
        outcomes["conflicted" if conflicted else "rebased"] += 1
        try:
            _assert_recovered_exactly_once(spark, feed, root, ckpt)
        except AssertionError as e:
            failures.append(f"race@{n} ({fs.raced_on}): {e}")
    assert not failures, (
        f"{len(failures)}/{total} race points lost or duplicated state "
        f"({outcomes}):\n" + "\n".join(failures[:10]))
    # the sweep must actually exercise the rebase path, not only aborts
    assert outcomes["rebased"] > 0, outcomes
