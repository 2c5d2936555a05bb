"""Phoenix SQL-over-HBase reader analog (hbase20xsqlreader parity): split
planning (splitPoints ranges, auto splitKey ranges, querySql passthrough),
catalog validation, and parallel execution against a real embedded DB."""

from __future__ import annotations

import sqlite3

import pytest

from datax_spark.sources.phoenix import (
    build_phoenix_splits,
    check_catalog,
    clean_where,
    phoenix_read,
    quote_table,
    split_point_predicates,
)


def test_split_point_predicates_reference_shape():
    # buildSplitRange:296-308 — n+1 tiles: <= p1, (p1, p2], > p2
    got = split_point_predicates("id", [100, 200], kind="long")
    assert got == [
        "id <= 100",
        "id > 100 AND id <= 200",
        "id > 200",
    ]
    # type-directed literal framing (buildSplitRange:276-295)
    assert split_point_predicates("k", ["m"], kind="varchar")[0] == "k <= 'm'"
    assert split_point_predicates("d", ["2024-01-01"], kind="date")[0] == \
        "d <= TO_DATE('2024-01-01')"
    assert split_point_predicates("t", ["12:00:00"], kind="time")[2 - 1] == \
        "t > TO_TIME('12:00:00')"
    assert "TO_TIMESTAMP('2024-01-01 00:00:00')" in \
        split_point_predicates("ts", ["2024-01-01 00:00:00"],
                               kind="timestamp")[0]
    with pytest.raises(ValueError):
        split_point_predicates("b", [b"\x00"], kind="varbinary")


def test_clean_where_and_quoting():
    # dealWhere:156-166 — trailing ASCII and full-width semicolons dropped
    assert clean_where("v > 5;") == "v > 5"
    assert clean_where("v > 5；") == "v > 5"
    assert clean_where("  ") is None
    # validateParameter:50-56 — schema-qualified double quoting
    assert quote_table("t") == '"t"'
    assert quote_table("t", "s") == '"s"."t"'


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "phx.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE kv (id INTEGER PRIMARY KEY, name TEXT, v INTEGER)")
    con.executemany(
        "INSERT INTO kv VALUES (?, ?, ?)",
        [(i, f"n{i:04d}", i * 7 % 101) for i in range(1, 301)],
    )
    # SYSTEM.CATALOG stand-in: (column_name, column_family), NULL family = PK
    # (checkTable:104-113 reads exactly these two columns)
    con.execute("CREATE TABLE catalog (column_name TEXT, column_family TEXT)")
    con.executemany("INSERT INTO catalog VALUES (?, ?)",
                    [("id", None), ("name", "0"), ("v", "0")])
    con.commit(); con.close()
    return path


CATALOG_SQL = "SELECT column_name, column_family FROM catalog"


def test_check_catalog_validates_columns_and_pk(db):
    all_cols, pk_cols = check_catalog(
        "sqlite3", db, CATALOG_SQL, ["id", "v"], "id")
    assert all_cols == ["id", "name", "v"] and pk_cols == ["id"]
    with pytest.raises(ValueError, match="not in table metadata"):
        check_catalog("sqlite3", db, CATALOG_SQL, ["nope"], None)
    with pytest.raises(ValueError, match="not a primary-key column"):
        check_catalog("sqlite3", db, CATALOG_SQL, None, "name")


def test_split_plans(db):
    # splitPoints mode: ranges appended under the cleaned where (doSplit:218-226)
    sqls = build_phoenix_splits(
        "sqlite3", db, "kv", ["id", "v"], where="v >= 0;",
        split_key="id", split_points=[100, 200])
    assert len(sqls) == 3
    assert sqls[0] == 'SELECT "id", "v" FROM "kv" WHERE v >= 0 AND (id <= 100)'
    assert all('FROM "kv"' in s for s in sqls)
    # auto mode: min/max ranges, no IS NULL residual (Phoenix PKs non-null)
    auto = build_phoenix_splits(
        "sqlite3", db, "kv", ["id", "v"], split_key="id", num_partitions=4)
    assert len(auto) == 4 and not any("IS NULL" in s for s in auto)


def test_phoenix_read_split_points_exact(spark, db):
    got = phoenix_read(
        spark, "sqlite3", db, "id long, name string, v long",
        table="kv", split_key="id", split_points=[100, 200],
        catalog_sql=CATALOG_SQL,
    ).toPandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 300                      # tiles cover every row once
    assert got["id"].tolist() == list(range(1, 301))
    assert got.loc[41, "name"] == "n0042"


def test_phoenix_read_auto_split_with_where(spark, db):
    got = phoenix_read(
        spark, "sqlite3", db, "id long, v long",
        table="kv", columns=["id", "v"], where="id <= 150;",
        split_key="id", num_partitions=4, catalog_sql=CATALOG_SQL,
    ).toPandas()
    assert sorted(got["id"].tolist()) == list(range(1, 151))
    direct = dict(sqlite3.connect(db).execute(
        "SELECT id, v FROM kv WHERE id <= 150").fetchall())
    assert dict(zip(got["id"], got["v"])) == direct


def test_phoenix_read_query_sqls_mode(spark, db):
    got = phoenix_read(
        spark, "sqlite3", db, "id long", query_sqls=[
            "SELECT id FROM kv WHERE id <= 150",
            "SELECT id FROM kv WHERE id > 150",
        ],
    ).toPandas()
    assert sorted(got["id"].tolist()) == list(range(1, 301))


def test_jobspec_registry_adapter(spark, db):
    from datax_spark.sources.readers import build_reader

    got = build_reader(spark, "hbase20xsqlreader", {
        "driver": "sqlite3",
        "queryServerAddress": db,
        "outputSchema": "id long, v long",
        "table": "kv",
        "column": ["id", "v"],
        "splitKey": "id",
        "splitPoint": [150],
        "catalogSql": CATALOG_SQL,
    }).toPandas()
    assert sorted(got["id"].tolist()) == list(range(1, 301))
