"""RDBMS vector source with filter / column / bbox pushdown.

Mirrors the reference's PostGIS table layer
(gdal/ogr/ogrsf_frmts/pg/ogrpgtablelayer.cpp:666-705 BuildWhere — the
attribute filter and the spatial filter's ``&&`` bounding-box operator
are pushed into the SQL the server executes, so the database scans
instead of the client), re-expressed for Spark two ways:

1. :func:`jdbc_options` — the options dict for ``spark.read.format
   ("jdbc")`` on a real cluster: the pushdown lives in a ``dbtable``
   subquery (column pruning + WHERE + bbox) plus Spark's own
   partitionColumn range splitting. Catalyst additionally pushes any
   later ``.filter``/``.select`` through the JDBC relation.
2. :func:`read_dbapi` — a JVM-driver-free executor-side reader for
   DB-API databases (sqlite3 files, or any pickleable connect
   callable): each task opens its own connection and runs the SAME
   pushed-down SQL for its partition range. This is the in-process
   stand-in this sandbox can test; the SQL text is shared with (1).

Spatial pushdown follows the PG pattern: the geometry's bounding box is
stored (or indexed) as columns/functions; a spatial filter becomes
range predicates the database can serve from an index —
``xmax >= :minx AND xmin <= :maxx AND ymax >= :miny AND ymin <= :maxy``
(the expansion of PostGIS ``geom && ST_MakeEnvelope(...)``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PushdownSpec:
    table: str
    columns: list[str] | None = None          # None = *
    where: str | None = None                  # attribute filter (SQL)
    bbox: tuple[float, float, float, float] | None = None
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax")
    partition_col: str | None = None
    lower: int | None = None
    upper: int | None = None
    num_partitions: int = 8
    extra_predicates: list[str] = field(default_factory=list)

    # ---- SQL text ----------------------------------------------------
    def select_list(self) -> str:
        return ", ".join(self.columns) if self.columns else "*"

    def predicates(self) -> list[str]:
        preds = list(self.extra_predicates)
        if self.where:
            preds.append(f"({self.where})")
        if self.bbox is not None:
            x0, y0, x1, y1 = self.bbox
            cx0, cy0, cx1, cy1 = self.bbox_cols
            # geom && envelope, expanded to index-serveable ranges
            # (ogrpgtablelayer.cpp BuildWhere's && filter)
            preds.append(f"({cx1} >= {x0!r} AND {cx0} <= {x1!r} AND "
                         f"{cy1} >= {y0!r} AND {cy0} <= {y1!r})")
        return preds

    def base_sql(self) -> str:
        sql = f"SELECT {self.select_list()} FROM {self.table}"
        preds = self.predicates()
        if preds:
            sql += " WHERE " + " AND ".join(preds)
        return sql

    def partition_sqls(self) -> list[str]:
        """One fully-pushed SELECT per partition (range splits on
        ``partition_col``, Spark-JDBC style: first/last ranges are
        open-ended so no rows fall outside)."""
        if self.partition_col is None:
            return [self.base_sql()]
        if self.lower is None or self.upper is None:
            raise ValueError("partition_col needs lower/upper bounds")
        n = max(1, self.num_partitions)
        span = max(self.upper - self.lower, 1)
        cuts = [self.lower + span * k // n for k in range(1, n)]
        col = self.partition_col
        ranges = []
        prev = None
        for c in cuts + [None]:
            parts = []
            if prev is not None:
                parts.append(f"{col} >= {prev}")
            if c is not None:
                parts.append(f"{col} < {c}")
            ranges.append(" AND ".join(parts) or "1=1")
            prev = c
        preds = self.predicates()
        out = []
        for rng in ranges:
            ps = preds + [f"({rng})"]
            out.append(f"SELECT {self.select_list()} FROM {self.table}"
                       f" WHERE " + " AND ".join(ps))
        return out


def jdbc_options(url: str, spec: PushdownSpec,
                 driver: str | None = None) -> dict:
    """``spark.read.format('jdbc').options(**jdbc_options(...))`` —
    pushdown baked into the dbtable subquery; range partitioning via
    Spark's partitionColumn machinery when a partition column is set."""
    opts = {"url": url,
            "dbtable": f"({spec.base_sql()}) AS pushed"}
    if driver:
        opts["driver"] = driver
    if spec.partition_col is not None:
        if spec.lower is None or spec.upper is None:
            raise ValueError("partition_col needs lower/upper bounds")
        opts.update({"partitionColumn": spec.partition_col,
                     "lowerBound": str(spec.lower),
                     "upperBound": str(spec.upper),
                     "numPartitions": str(spec.num_partitions)})
    return opts


def read_dbapi(spark, connect, spec: PushdownSpec, schema: str):
    """Executor-side DB-API read: one task per partition SQL, each task
    opening its own connection (``connect``: pickleable zero-arg
    callable, e.g. ``functools.partial(sqlite3.connect, path)``).
    The database evaluates the pushed WHERE/bbox/column list — rows
    crossing into Spark are already pruned, the PostGIS-layer shape."""
    import pandas as pd

    sqls = spec.partition_sqls()
    sdf = spark.createDataFrame(list(enumerate(sqls)), "pid int, sql string")

    def run(batches):
        for pdf in batches:
            for sql in pdf["sql"]:
                con = connect()
                try:
                    cur = con.execute(sql)
                    cols = [d[0] for d in cur.description]
                    rows = cur.fetchall()
                finally:
                    con.close()
                yield pd.DataFrame(rows, columns=cols)

    return sdf.repartition(len(sqls), "pid").mapInPandas(run, schema)
