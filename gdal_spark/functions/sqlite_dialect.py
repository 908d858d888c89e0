"""SQLite-dialect layer-introspection and blob functions
(gdal/ogr/ogr_sql_sqlite.dox:103-207).

The reference exposes per-layer helpers inside its SQLite SQL dialect —
``ogr_layer_Extent``, ``ogr_layer_SRID``, ``ogr_layer_GeometryType``,
``ogr_layer_FeatureCount`` (ogr_sql_sqlite.dox:103-140, implemented in
gdal/ogr/ogrsqlitesqlfunctions.cpp) — plus blob compression helpers
``ogr_deflate`` / ``ogr_inflate`` (ogr_sql_sqlite.dox:190-207).

Spark-first shape: a "layer" is a DataFrame; the introspection helpers are
single partial aggregations (map-side combine, one exchange collapsing to a
1-row frame) — the same plan Catalyst produces for ``SELECT min(x) …`` —
so they hold at any scale. ``layer_info`` unions the per-layer rows into
one catalog frame, mirroring a dialect query that calls all four helpers
per layer. Geometry-type codes are extracted from the WKB header byte in
JVM column math (no Python in the path); deflate/inflate run zlib inside
Arrow-batched pandas UDFs (per-blob work, embarrassingly parallel).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TYPE_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
               5: "MULTILINESTRING", 6: "MULTIPOLYGON",
               7: "GEOMETRYCOLLECTION"}


def wkb_type_code(wkb: Column) -> Column:
    """Geometry type code from the WKB header, pure JVM column math.

    Little-endian WKB (byte0 = 1) keeps the low byte of the type at
    offset 1; big-endian at offset 4. Codes are < 256 for all 2-D types,
    so the low byte is the whole code."""
    lo = F.conv(F.hex(F.substring(wkb, 2, 1)), 16, 10).cast("int")
    hi = F.conv(F.hex(F.substring(wkb, 5, 1)), 16, 10).cast("int")
    first = F.conv(F.hex(F.substring(wkb, 1, 1)), 16, 10).cast("int")
    return F.when(first == 1, lo).otherwise(hi)


def wkb_type_name(wkb: Column) -> Column:
    """OGRToOGCGeomType name for the WKB type byte."""
    expr = F.lit("GEOMETRY")
    for code, name in _TYPE_NAMES.items():
        expr = F.when(wkb_type_code(wkb) == code, F.lit(name)).otherwise(expr)
    return expr


def ogr_layer_feature_count(layer: DataFrame) -> DataFrame:
    """ogr_layer_FeatureCount(layer) (ogr_sql_sqlite.dox:124)."""
    return layer.agg(F.count(F.lit(1)).alias("n_features"))


def ogr_layer_extent(layer: DataFrame, x: str | None = None,
                     y: str | None = None,
                     bbox: tuple[str, str, str, str] | None = None
                     ) -> DataFrame:
    """ogr_layer_Extent(layer) (ogr_sql_sqlite.dox:108): layer envelope.

    Point layers pass ``x``/``y`` columns; polygon layers pass their
    per-feature ``bbox`` columns (xmin, ymin, xmax, ymax) — both stay in
    whole-stage codegen."""
    if bbox is not None:
        x0, y0, x1, y1 = bbox
        return layer.agg(F.min(x0).alias("minx"), F.min(y0).alias("miny"),
                         F.max(x1).alias("maxx"), F.max(y1).alias("maxy"))
    return layer.agg(F.min(x).alias("minx"), F.min(y).alias("miny"),
                     F.max(x).alias("maxx"), F.max(y).alias("maxy"))


def ogr_layer_geometry_type(layer: DataFrame, wkb_col: str) -> DataFrame:
    """ogr_layer_GeometryType(layer) (ogr_sql_sqlite.dox:116): the layer's
    geometry type name; mixed-type layers report 'GEOMETRY' (the dialect's
    generic answer)."""
    kinds = layer.agg(
        F.collect_set(wkb_type_name(F.col(wkb_col))).alias("kinds"))
    return kinds.select(
        F.when(F.size("kinds") == 1, F.element_at("kinds", 1))
         .otherwise(F.lit("GEOMETRY")).alias("geom_type"))


def layer_info(layers: dict[str, dict]) -> DataFrame:
    """One catalog row per layer: (layer_name, n_features, geom_type, srid,
    minx, miny, maxx, maxy) — the dialect's four helpers in one frame.

    ``layers`` maps name → spec with keys: ``df``; either ``x``/``y``
    (point layer) or ``bbox`` (polygon layer with envelope columns);
    either ``wkb`` (geometry-type from data) or ``geom_type`` (declared);
    optional ``srid`` (default 4326, the engine's layer convention)."""
    frames = []
    for name, spec in layers.items():
        df = spec["df"]
        if "bbox" in spec:
            x0, y0, x1, y1 = spec["bbox"]
            agg = [F.min(x0).alias("minx"), F.min(y0).alias("miny"),
                   F.max(x1).alias("maxx"), F.max(y1).alias("maxy")]
        else:
            agg = [F.min(spec["x"]).alias("minx"),
                   F.min(spec["y"]).alias("miny"),
                   F.max(spec["x"]).alias("maxx"),
                   F.max(spec["y"]).alias("maxy")]
        if "wkb" in spec:
            gt = F.when(
                F.size(F.collect_set(wkb_type_name(F.col(spec["wkb"])))) == 1,
                F.max(wkb_type_name(F.col(spec["wkb"])))
            ).otherwise(F.lit("GEOMETRY")).alias("geom_type")
        else:
            gt = F.max(F.lit(spec["geom_type"])).alias("geom_type")
        row = df.agg(F.count(F.lit(1)).alias("n_features"), gt, *agg).select(
            F.lit(name).alias("layer_name"), "n_features", "geom_type",
            F.lit(int(spec.get("srid", 4326))).alias("srid"),
            "minx", "miny", "maxx", "maxy")
        frames.append(row)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# blob compression (ogr_sql_sqlite.dox:190-207)
# ---------------------------------------------------------------------------

def ogr_deflate(col: Column, level: int = 6) -> Column:
    """ogr_deflate(blob[, level]): zlib-compress a binary column."""
    def fn(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None
                     else zlib.compress(bytes(b), level))
    return F.pandas_udf(fn, "binary")(col)


def ogr_inflate(col: Column) -> Column:
    """ogr_inflate(blob): zlib-decompress; NULL on malformed input,
    matching the dialect's error behavior."""
    def fn(s: pd.Series) -> pd.Series:
        def un(b):
            if b is None:
                return None
            try:
                return zlib.decompress(bytes(b))
            except zlib.error:
                return None
        return s.map(un)
    return F.pandas_udf(fn, "binary")(col)


# ---------------------------------------------------------------------------
# SpatiaLite aggregate functions: MakeLine / Collect / Extent
# (the dialect's SpatiaLite surface, ogr_sql_sqlite.dox:104-126;
# semantics per the public SpatiaLite SQL reference)
# ---------------------------------------------------------------------------

def st_envelope_cols(wkb_col: Column):
    """Per-geometry envelope as (minx, miny, maxx, maxy) struct — one
    Arrow-batched pass; the downstream Extent() agg is then pure JVM
    min/max."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from gdal_spark.functions import geometry as G

    schema = StructType([StructField(c, DoubleType())
                         for c in ("minx", "miny", "maxx", "maxy")])

    @F.pandas_udf(schema)
    def fn(s: pd.Series) -> pd.DataFrame:
        rows = []
        for wkb in s:
            try:
                rows.append(G.geometry_envelope(bytes(wkb)))
            except Exception:
                rows.append((None, None, None, None))
        return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"])

    return fn(wkb_col)


def extent_agg(df: DataFrame, group_cols: list[str],
               wkb_col: str = "wkb") -> DataFrame:
    """SpatiaLite ``Extent(geom)`` aggregate: per-group envelope as a
    5-point rectangle POLYGON (WKB in ``extent_wkb``). Envelope columns
    reduce with map-side-combinable min/max — one exchange; the polygon
    assembly is driver-free column math on the tiny grouped result."""
    env = df.withColumn("_env", st_envelope_cols(F.col(wkb_col)))
    agg = (env.groupBy(*group_cols)
           .agg(F.min("_env.minx").alias("minx"),
                F.min("_env.miny").alias("miny"),
                F.max("_env.maxx").alias("maxx"),
                F.max("_env.maxy").alias("maxy")))

    from pyspark.sql.types import BinaryType

    from gdal_spark.functions import geometry as G

    @F.pandas_udf(BinaryType())
    def rect(minx: pd.Series, miny: pd.Series, maxx: pd.Series,
             maxy: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for x0, y0, x1, y1 in zip(minx, miny, maxx, maxy):
            ring = np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                             (x0, y0)])
            out.append(G.encode_polygon([ring]))
        return pd.Series(out)

    return agg.withColumn(
        "extent_wkb", rect("minx", "miny", "maxx", "maxy"))


_MULTI_OF = {1: 4, 2: 5, 3: 6}


def collect_agg(df: DataFrame, group_cols: list[str],
                wkb_col: str = "wkb",
                order_col: str | None = None) -> DataFrame:
    """SpatiaLite ``Collect(geom)`` / ``ST_Collect`` aggregate: uniform
    Point/LineString/Polygon groups collect into the matching Multi
    type, mixed groups into a GEOMETRYCOLLECTION (``collect_wkb``).

    Shape: JVM ``collect_list`` of (order, wkb) structs per group (one
    shuffle with partial aggregation), then a per-group Arrow pass
    assembles the multi-WKB. Group payloads must fit an executor — the
    same contract as the reference's in-memory aggregate."""
    from pyspark.sql.types import BinaryType

    from gdal_spark.functions import geometry as G

    okey = F.col(order_col) if order_col else F.monotonically_increasing_id()
    rows = df.select(*group_cols,
                     F.struct(okey.alias("o"),
                              F.col(wkb_col).alias("g")).alias("_sg"))
    agg = rows.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_sg")).alias("_gs"))

    @F.pandas_udf(BinaryType())
    def assemble(col: pd.Series) -> pd.Series:
        out = []
        for items in col:
            wkbs = [bytes(it["g"]) for it in items]
            kinds = {G._read_header(memoryview(w), 0)[0] for w in wkbs}
            if len(kinds) == 1 and next(iter(kinds)) in _MULTI_OF:
                kind = next(iter(kinds))
                mtype = _MULTI_OF[kind]
                import struct as _st
                body = [b"\x01", _st.pack("<II", mtype, len(wkbs))]
                body.extend(wkbs)
                out.append(b"".join(body))
            else:
                out.append(G.encode_geometrycollection(wkbs))
        return pd.Series(out)

    return agg.withColumn("collect_wkb", assemble("_gs")).drop("_gs")


def make_line_agg(df: DataFrame, group_cols: list[str],
                  point_col: str = "wkb",
                  order_col: str | None = None) -> DataFrame:
    """SpatiaLite ``MakeLine(point)`` aggregate: per-group LINESTRING
    through the points in ``order_col`` order (``line_wkb``)."""
    from pyspark.sql.types import BinaryType

    from gdal_spark.functions import geometry as G

    okey = F.col(order_col) if order_col else F.monotonically_increasing_id()
    rows = df.select(*group_cols,
                     F.struct(okey.alias("o"),
                              F.col(point_col).alias("g")).alias("_sg"))
    agg = rows.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_sg")).alias("_gs"))

    @F.pandas_udf(BinaryType())
    def assemble(col: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for items in col:
            pts = np.array([G.decode_point(bytes(it["g"]))
                            for it in items])
            out.append(G.encode_linestring(pts))
        return pd.Series(out)

    return agg.withColumn("line_wkb", assemble("_gs")).drop("_gs")
