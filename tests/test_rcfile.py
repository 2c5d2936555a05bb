"""RCFile round trip — runs in a subprocess because the hive catalog choice
is per-JVM and the shared test session is in-memory-catalog."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from datax_spark.sources.readers import build_reader


def test_rcfile_requires_hive_session(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="hive"):
        build_reader(spark, "rcfilereader", {
            "path": str(tmp_path), "schema": "id int",
        })


def test_rcfile_roundtrip_subprocess(tmp_path):
    script = textwrap.dedent(f"""
        import sys, os
        sys.path.insert(0, "/root/repo")
        os.chdir("{tmp_path}")
        from datax_spark.session import get_spark
        from datax_spark.sources.readers import build_reader
        from datax_spark.sources.writers import build_writer

        spark = get_spark(
            app_name="rcfile-test", master="local[2]", shuffle_partitions=2,
            extra_conf={{
                "spark.sql.warehouse.dir": "{tmp_path}/wh",
                "javax.jdo.option.ConnectionURL":
                    "jdbc:derby:;databaseName={tmp_path}/ms;create=true",
            }},
            hive=True,
        )
        # explicit double cast: id * 1.5 is decimal(23,1) under ANSI, and a
        # reader schema declaring a different type than the writer DDL makes
        # the RCFile serde fail with ArrayIndexOutOfBounds, not a type error
        df = spark.range(50).selectExpr(
            "cast(id as int) id", "concat('n', id) name",
            "cast(id * 1.5 as double) score")
        build_writer(df, "rcfilewriter",
                     {{"path": "{tmp_path}/rc", "writeMode": "truncate"}})
        back = build_reader(spark, "rcfilereader", {{
            "path": "{tmp_path}/rc",
            "schema": "id int, name string, score double",
            "where": "id >= 10",
            "columns": ["id", "score"],
        }})
        rows = {{r.id: r.score for r in back.collect()}}
        assert back.columns == ["id", "score"], back.columns
        assert len(rows) == 40 and rows[20] == 30.0, (len(rows), rows.get(20))
        spark.stop()
        print("RCFILE_OK")
    """)
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert "RCFILE_OK" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
