"""SQL-database vector source: pushdown SQL generation (the PostGIS
BuildWhere pattern, ogrpgtablelayer.cpp:666-705) + an in-process sqlite3
functional test of the executor-side DB-API reader."""

import functools
import sqlite3

import pytest

from gdal_spark.sources.sqldb import PushdownSpec, jdbc_options, read_dbapi


def _spec(**kw):
    base = dict(table="roads", columns=["fid", "name", "xmin", "ymin",
                                        "xmax", "ymax"],
                where="kind = 'motorway'",
                bbox=(0.0, 10.0, 5.0, 20.0))
    base.update(kw)
    return PushdownSpec(**base)


def test_pushdown_sql_contains_all_filters():
    sql = _spec().base_sql()
    # column pruning
    assert sql.startswith("SELECT fid, name, xmin, ymin, xmax, ymax FROM")
    # attribute filter pushed
    assert "kind = 'motorway'" in sql
    # bbox expanded to index-serveable range predicates (&& expansion)
    assert "xmax >= 0.0" in sql and "xmin <= 5.0" in sql
    assert "ymax >= 10.0" in sql and "ymin <= 20.0" in sql


def test_partition_ranges_cover_domain():
    spec = _spec(partition_col="fid", lower=0, upper=100,
                 num_partitions=4)
    sqls = spec.partition_sqls()
    assert len(sqls) == 4
    # first range open below, last open above — no dropped rows
    assert "fid >= " not in sqls[0].split("(")[-1] or "fid < 25" in sqls[0]
    assert "fid < " not in sqls[-1].split("(")[-1]
    for s in sqls:
        assert "kind = 'motorway'" in s and "xmax >= 0.0" in s


def test_jdbc_options_shape():
    opts = jdbc_options("jdbc:postgresql://db/gis",
                        _spec(partition_col="fid", lower=0, upper=100,
                              num_partitions=4),
                        driver="org.postgresql.Driver")
    assert opts["dbtable"].startswith("(SELECT fid, name")
    assert "kind = 'motorway'" in opts["dbtable"]
    assert opts["partitionColumn"] == "fid"
    assert opts["numPartitions"] == "4"


@pytest.fixture(scope="module")
def roads_db(tmp_path_factory):
    p = tmp_path_factory.mktemp("db") / "roads.sqlite"
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE roads (fid INTEGER, name TEXT, kind TEXT, "
                "xmin REAL, ymin REAL, xmax REAL, ymax REAL)")
    rows = []
    for fid in range(200):
        kind = "motorway" if fid % 3 == 0 else "path"
        x = float(fid % 20)
        y = float(fid % 30)
        rows.append((fid, f"r{fid}", kind, x, y, x + 1.0, y + 1.0))
    con.executemany("INSERT INTO roads VALUES (?,?,?,?,?,?,?)", rows)
    con.commit()
    con.close()
    return str(p)


def test_read_dbapi_pushdown_and_partitioning(spark, roads_db):
    spec = _spec(partition_col="fid", lower=0, upper=200,
                 num_partitions=5)
    df = read_dbapi(spark, functools.partial(sqlite3.connect, roads_db),
                    spec, "fid long, name string, xmin double, "
                          "ymin double, xmax double, ymax double")
    got = sorted(r["fid"] for r in df.collect())
    # oracle: same filter evaluated directly
    con = sqlite3.connect(roads_db)
    want = sorted(r[0] for r in con.execute(
        "SELECT fid FROM roads WHERE kind = 'motorway' AND xmax >= 0 "
        "AND xmin <= 5 AND ymax >= 10 AND ymin <= 20"))
    con.close()
    assert got == want and len(got) > 0
    # partition splits keep every row exactly once (no dup/drop at cuts)
    assert len(got) == len(set(got))


def test_read_dbapi_column_pruning(spark, roads_db):
    spec = PushdownSpec(table="roads", columns=["fid", "name"],
                        where="fid < 10")
    df = read_dbapi(spark, functools.partial(sqlite3.connect, roads_db),
                    spec, "fid long, name string")
    assert df.columns == ["fid", "name"]
    assert df.count() == 10
