"""OGR VRT virtual vector layers.

Re-expresses the reference VRT driver
(gdal/ogr/ogrsf_frmts/vrt/ogrvrtlayer.cpp, ogrvrtdatasource.cpp) as a
declarative plan over another driver's DataFrame.  The VRT XML is
parsed driver-side and compiled to Catalyst expressions: field
projection / renames are ``select``s, ``SrcRegion`` is a staged filter
(bbox then exact intersects), ``SrcSQL`` runs through the engine's OGR
SQL dialect, and geometry construction (``PointFromColumns`` / ``WKT``
/ ``WKB``) happens in vectorized Arrow batches.  Nothing is
materialized driver-side — the VRT layer is literally a view, which is
the reference driver's design restated in Spark's terms.

Geometry is the engine-wide 2-D WKB contract (Z columns pass through
as attributes; ``z=`` on PointFromColumns is accepted and ignored at
encode, like every other driver here).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import geometry as G
from gdal_spark.functions import st as ST
from gdal_spark.sources import formats as FMT

_GEOM_TYPES = {  # OGRVRTGetGeometryType (ogrvrtlayer.cpp asGeomTypeNames)
    "wkbNone": "NONE", "wkbUnknown": "GEOMETRY", "wkbPoint": "POINT",
    "wkbLineString": "LINESTRING", "wkbPolygon": "POLYGON",
    "wkbMultiPoint": "MULTIPOINT",
    "wkbMultiLineString": "MULTILINESTRING",
    "wkbMultiPolygon": "MULTIPOLYGON",
    "wkbGeometryCollection": "GEOMETRYCOLLECTION",
}


def _load_xml(src: str) -> tuple[ET.Element, str]:
    """Accept a .vrt path or inline ``<OGRVRTDataSource>`` XML (the
    reference driver sniffs the same two spellings,
    ogrvrtdatasource.cpp)."""
    s = src.strip()
    if s.startswith("<"):
        return ET.fromstring(s), os.getcwd()
    with open(src, "r", encoding="utf-8") as f:
        return ET.fromstring(f.read()), os.path.dirname(os.path.abspath(src))


def _resolve(path: str, relative_to_vrt: bool, base_dir: str) -> str:
    if os.path.isabs(path):
        return path
    if relative_to_vrt:
        return os.path.join(base_dir, path)
    # relative to the process cwd, as CPLProjectRelativeFilename falls
    # back; accept the VRT's own directory (and its parent, for paths
    # spelled from the datasource root like "data/x.dbf") so fixture
    # files work from any cwd.
    for cand in (path, os.path.join(base_dir, path),
                 os.path.join(os.path.dirname(base_dir), path)):
        if os.path.exists(cand):
            return cand
    return path


def vrt_layer_names(src: str) -> list[str]:
    root, _ = _load_xml(src)
    return [n.get("name") or f"layer{i}"
            for i, n in enumerate(root.findall("OGRVRTLayer"))]


def _dbf_spark_fields(dbf_path: str) -> list[tuple[str, str]]:
    """Field (name, spark type) pairs from a .dbf header — mirrors the
    value typing of FMT.parse_dbf so the JSON round-trip is lossless."""
    with open(dbf_path, "rb") as f:
        data = f.read(32)
        hsize = int.from_bytes(data[8:10], "little")
        data += f.read(hsize - 32)
    fields, off = [], 32
    while off < len(data) and data[off] != 0x0D:
        name = data[off:off + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(data[off + 11])
        fdec = data[off + 17]
        if ftype in ("N", "F"):
            stype = "long" if (ftype == "N" and fdec == 0) else "double"
        elif ftype == "L":
            stype = "boolean"
        else:
            stype = "string"
        fields.append((name, stype))
        off += 32
    return fields


def _load_source(spark: SparkSession, path: str) -> DataFrame:
    """Open the underlying datasource and normalize to typed columns +
    ``fid`` + ``geometry``.  Shapefile/DBF sources come back in the
    generic FEATURE_SCHEMA (properties as JSON); expand them using the
    exact field typing of the .dbf header."""
    low = path.lower()
    if low.endswith((".shp", ".dbf")):
        df = FMT.read_shapefile(spark, path)
        dbf = path[:-4] + ".dbf" if low.endswith(".shp") else path
        if os.path.exists(dbf):
            fields = _dbf_spark_fields(dbf)
            schema = ", ".join(f"`{n}` {t}" for n, t in fields)
            df = df.select(
                F.col("fid").alias("_src_fid"),
                F.from_json("properties", schema).alias("_p"),
                "geometry",
            ).select("_src_fid", "_p.*", "geometry")
        else:
            df = df.select(F.col("fid").alias("_src_fid"), "geometry")
        return df
    if low.endswith(".csv"):
        # raw attribute table: the VRT's GeometryField decides how (and
        # whether) geometry is built, not the CSV driver's conventions
        df = spark.read.options(header="true", inferSchema="true",
                                escape='"').csv(path)
    else:
        from gdal_spark.apps import read_vector  # lazy: apps imports us
        df = read_vector(spark, path)
    if "fid" in df.columns:
        df = df.withColumn("_src_fid", F.col("fid").cast("long")) \
               .drop("fid")
    else:
        from pyspark.sql import Window
        df = df.withColumn(
            "_src_fid", F.row_number().over(
                Window.orderBy(F.monotonically_increasing_id()))
            .cast("long") - 1)
    return df


def _encode_points_xy(df: DataFrame, x: str, y: str,
                      z: str | None = None) -> DataFrame:
    cols = [c for c in df.schema.fieldNames() if c != "geometry"]
    xi, yi = cols.index(x), cols.index(y)
    zi = cols.index(z) if z else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from gdal_spark.functions import curves as CV
        for pdf in batches:
            pdf = pdf.copy()
            if zi is None:
                pdf["geometry"] = [
                    None if pd.isna(vx) or pd.isna(vy)
                    else bytearray(G.encode_point(float(vx), float(vy)))
                    for vx, vy in zip(pdf.iloc[:, xi], pdf.iloc[:, yi])]
            else:
                # z column present: 2.5-D points (ogr_vrt_2 semantics)
                pdf["geometry"] = [
                    None if pd.isna(vx) or pd.isna(vy)
                    else bytearray(CV.encode_geom(CV.Geom(
                        G.WKB_POINT, True,
                        np.array([[float(vx), float(vy),
                                   0.0 if pd.isna(vz) else float(vz)]]))))
                    for vx, vy, vz in zip(pdf.iloc[:, xi],
                                          pdf.iloc[:, yi],
                                          pdf.iloc[:, zi])]
            yield pdf

    base = df.select(cols)
    schema = T.StructType(list(base.schema.fields)
                          + [T.StructField("geometry", T.BinaryType())])
    return base.mapInPandas(run, schema=schema)


def _decode_wkt_col(df: DataFrame, field: str) -> DataFrame:
    cols = [c for c in df.schema.fieldNames() if c != "geometry"]
    wi = cols.index(field)
    base = df.select(cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["geometry"] = [
                bytearray(G.wkb_from_wkt(w)) if isinstance(w, str) and w
                else None for w in pdf.iloc[:, wi]]
            yield pdf

    schema = T.StructType(list(base.schema.fields)
                          + [T.StructField("geometry", T.BinaryType())])
    return base.mapInPandas(run, schema=schema)


def _region_filter(df: DataFrame, region_wkt: str,
                   geometry_col: str = "geometry") -> DataFrame:
    """SrcRegion (ogrvrtlayer.cpp FullSpatialFilter): keep features
    intersecting the region — staged bbox prefilter then the exact
    predicate, both over Arrow batches."""
    region = G.wkb_from_wkt(region_wkt)
    rx0, ry0, rx1, ry1 = FMT._wkb_bbox(region)

    def hit(wkb: pd.Series) -> pd.Series:
        out = np.zeros(len(wkb), dtype=bool)
        for i, b in enumerate(wkb):
            if b is None:
                continue
            b = bytes(b)
            ex0, ey0, ex1, ey1 = FMT._wkb_bbox(b)
            if ex0 > rx1 or ex1 < rx0 or ey0 > ry1 or ey1 < ry0:
                continue
            out[i] = ST.st_intersects(b, region)
        return pd.Series(out)

    return df.filter(F.pandas_udf(hit, "boolean")(F.col(geometry_col)))


def read_vrt_vector(spark: SparkSession, src: str,
                    layer: str | None = None) -> DataFrame:
    """Open one OGRVRTLayer of a VRT datasource (path or inline XML) as
    a DataFrame: columns = declared fields (or all source fields),
    ``fid`` (copied from source order or the <FID> field), optional
    ``ogr_style`` from <Style>, and 2-D WKB ``geometry``."""
    root, base_dir = _load_xml(src)
    nodes = root.findall("OGRVRTLayer")
    if not nodes:
        raise ValueError("no OGRVRTLayer in VRT datasource")
    node = None
    if layer is None:
        node = nodes[0]
    else:
        for n in nodes:
            if n.get("name") == layer:
                node = n
                break
        if node is None:
            raise ValueError(f"VRT layer {layer!r} not found")

    sds = node.find("SrcDataSource")
    if sds is None or not (sds.text or "").strip():
        raise ValueError("missing SrcDataSource")  # invalid.vrt golden
    path = _resolve((sds.text or "").strip(),
                    (sds.get("relativeToVRT") or "0") in ("1", "TRUE",
                                                          "true", "ON"),
                    base_dir)
    df = _load_source(spark, path)

    src_layer = (node.findtext("SrcLayer") or
                 os.path.splitext(os.path.basename(path))[0]).strip()
    sql = node.findtext("SrcSQL")
    if sql and sql.strip():
        import re as _re

        from pyspark.sql import Window
        from gdal_spark.ogrsql import execute_sql
        base = df.drop("_src_fid")
        stmt = sql.strip()
        out = None
        # thread the source FID through plain SELECTs so <FID> still
        # resolves after the engine's '*' (which excludes the carrier)
        m = _re.match(r"(?is)^(SELECT\s+)(?!DISTINCT\b)(.*)$", stmt)
        if m and " GROUP BY " not in stmt.upper():
            try:
                out = execute_sql(
                    spark, m.group(1) + "FID AS _vrt_fid, " + m.group(2),
                    {src_layer: base})
            except Exception:
                out = None
        if out is None:
            out = execute_sql(spark, stmt, {src_layer: base})
        df = out if out is not None else df
        if "_vrt_fid" in df.columns:
            df = df.withColumnRenamed("_vrt_fid", "_src_fid")
        if "_src_fid" not in df.columns:
            # the SQL result is a fresh layer: 0-based sequential FIDs
            df = df.withColumn(
                "_src_fid", F.row_number().over(
                    Window.orderBy(F.monotonically_increasing_id()))
                .cast("long") - 1)

    gf = node.find("GeometryField")
    enc = (gf.get("encoding") if gf is not None else None) or "Direct"
    report_src = ((gf.get("reportSrcColumn") if gf is not None else None)
                  or "TRUE").lower() not in ("false", "0", "off")
    geom_src_cols: list[str] = []
    if enc == "PointFromColumns":
        x, y = gf.get("x"), gf.get("y")
        if not x or not y:
            raise ValueError("PointFromColumns requires x= and y=")
        df = _encode_points_xy(df, x, y, gf.get("z"))
        geom_src_cols = [c for c in (x, y, gf.get("z")) if c]
    elif enc == "WKT":
        field = gf.get("field")
        df = _decode_wkt_col(df, field)
        geom_src_cols = [field]
    elif enc == "WKB":
        field = gf.get("field")
        df = df.withColumn("geometry", F.unhex(F.upper(F.col(field)))
                           if dict(df.dtypes)[field] == "string"
                           else F.col(field))
        geom_src_cols = [field]
    elif enc == "Direct":
        field = gf.get("field") if gf is not None else None
        if field and field != "geometry":
            df = df.withColumn("geometry", F.col(field))
            geom_src_cols = [field]
    else:
        raise ValueError(f"unknown GeometryField encoding {enc!r}")

    region = node.findtext("SrcRegion")
    if region and region.strip() and "geometry" in df.columns:
        df = _region_filter(df, region.strip())

    fid_el = node.find("FID")
    fid_name = "fid"
    if fid_el is not None and (fid_el.text or "").strip():
        fid_name = fid_el.get("name") or "fid"
        fid_field = (fid_el.text or "").strip()
        if fid_field not in df.columns and fid_field.lower() == "fid":
            # a source field named 'fid' is this engine's FID carrier
            fid_field = "_src_fid"
        df = df.withColumn("__fid", F.col(fid_field).cast("long"))
    else:
        df = df.withColumn("__fid", F.col("_src_fid")
                           if "_src_fid" in df.columns
                           else F.lit(None).cast("long"))

    style = node.findtext("Style")
    style_col = style.strip() if style and style.strip() else None

    declared = node.findall("Field")
    if declared:
        attrs = []
        for fe in declared:
            name = fe.get("name")
            src_field = fe.get("src") or name
            attrs.append(F.col(src_field).alias(name))
    else:
        drop = {"_src_fid", "geometry", "__fid", "src", "properties",
                fid_name}  # the feature FID wins a name collision
        if not report_src:
            drop |= set(geom_src_cols)
        attrs = [F.col(c) for c in df.columns if c not in drop]

    out_cols = [F.col("__fid").alias(fid_name)] + attrs
    if style_col:
        out_cols.append(F.col(style_col).alias("ogr_style"))
    if "geometry" in df.columns:
        out_cols.append(F.col("geometry"))
    return df.select(out_cols)
