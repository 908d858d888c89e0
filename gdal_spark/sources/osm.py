"""OpenStreetMap reader (.osm.pbf / .osm XML): the reference's five
fixed layers (points, lines, multipolygons, multilinestrings,
other_relations) with osmconf.ini semantics.

Reference semantics: gdal/ogr/ogrsf_frmts/osm/osm_parser.cpp (PBF wire
decode; the field numbers are the public OSM PBF spec), and
ogrosmdatasource.cpp — closed-way-is-area (:1834-1858), lines
significance (:1862-1875), standalone polygons require tags after
filtering (:1767-1775) and are consumed by closed outer members of
complete multipolygon relations (:2237-2243), relation routing + tag
inheritance from the first outer way (:2400-2496), multipolygon ring
assembly from closed members + edge-chained open members with
containment nesting (:2155-2325, organizePolygons DEFAULT), geometry
collections (:2330-2395); ogrosmlayer.cpp hstore formatting
(:516-533) and ignore-prefix matching (:560-583); field lists and the
z_order formula from gdal/data/osmconf.ini.

Spark shape: a PBF is a sequence of independently decodable blobs
(~8k entities each). The driver scans only the 4+~20-byte blob
headers to build a blob index; executors inflate and parse blobs to
node/way/relation rows (mapInPandas; packed varints decode in
vectorized numpy). Geometry resolution is the classic distributed OSM
join: posexplode way->node refs, shuffle-join on node id,
array_sort(collect_list) back into ordered coordinate arrays — the
single big shuffle for a planet-scale file, with #blobs-way scan
parallelism. Way/relation classification, tag filtering, hstore
assembly and z_order are pure JVM column math; only WKB construction
runs in Arrow-batched kernels, and only relations (a tiny fraction of
a planet file) use a per-key applyInPandas. The .osm XML path parses
on the driver (the reference is likewise a single-threaded expat
parse) into the same three raw tables and shares all assembly."""
from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# osmconf.ini defaults (gdal/data/osmconf.ini)
# ---------------------------------------------------------------------------

CLOSED_WAYS_ARE_POLYGONS = (
    "aeroway amenity boundary building craft geological historic landuse "
    "leisure military natural office place shop sport tourism").split()

_IGNORE_DEFAULT = ("created_by converted_by source time ele note "
                   "openGeoDB: fixme FIXME").split()

LAYER_CONFIG = {
    "points": {
        "attributes": ["name", "barrier", "highway", "ref", "address",
                       "is_in", "place", "man_made"],
        "unsignificant": ["created_by", "converted_by", "source", "time",
                          "ele", "attribution"],
        "ignore": _IGNORE_DEFAULT,
    },
    "lines": {
        "attributes": ["name", "highway", "waterway", "aerialway",
                       "barrier", "man_made"],
        "ignore": _IGNORE_DEFAULT,
    },
    "multipolygons": {
        "attributes": ["name", "type", "aeroway", "amenity", "admin_level",
                       "barrier", "boundary", "building", "craft",
                       "geological", "historic", "land_area", "landuse",
                       "leisure", "man_made", "military", "natural",
                       "office", "place", "shop", "sport", "tourism"],
        "ignore": ["area"] + _IGNORE_DEFAULT,
    },
    "multilinestrings": {
        "attributes": ["name", "type"],
        "ignore": ["area"] + _IGNORE_DEFAULT,
    },
    "other_relations": {
        "attributes": ["name", "type"],
        "ignore": ["area"] + _IGNORE_DEFAULT,
    },
}

# tags dropped when a way is stored as an area candidate
# (ogrosmdatasource.cpp:1974-1988)
_AREA_WAY_DROP = {"area", "created_by", "converted_by", "note", "todo",
                  "fixme", "FIXME"}

_TAGS_T = T.ArrayType(T.StructType([T.StructField("k", T.StringType()),
                                    T.StructField("v", T.StringType())]))

_NODE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()), T.StructField("lon", T.LongType()),
    T.StructField("lat", T.LongType()), T.StructField("tags", _TAGS_T)])
_WAY_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("refs", T.ArrayType(T.LongType())),
    T.StructField("tags", _TAGS_T)])
_REL_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("mtypes", T.ArrayType(T.IntegerType())),
    T.StructField("mrefs", T.ArrayType(T.LongType())),
    T.StructField("mroles", T.ArrayType(T.StringType())),
    T.StructField("tags", _TAGS_T)])


def load_osmconf(path: str) -> dict:
    """Parse an osmconf.ini-style file into the LAYER_CONFIG shape
    (subset the reference reads in ogrosmdatasource.cpp:3270-3460:
    closed_ways_are_polygons, per-layer attributes / unsignificant /
    ignore / all_tags / other_tags / report_all_*)."""
    conf = {"closed_ways_are_polygons": list(CLOSED_WAYS_ARE_POLYGONS),
            "report_all_nodes": False, "report_all_ways": False,
            "layers": {k: dict(v) for k, v in LAYER_CONFIG.items()}}
    section = None
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1]
            continue
        if "=" not in line:
            continue
        key, _, val = line.partition("=")
        if section is None:
            if key == "closed_ways_are_polygons":
                conf["closed_ways_are_polygons"] = val.split(",")
            elif key == "report_all_nodes":
                conf["report_all_nodes"] = val == "yes"
            elif key == "report_all_ways":
                conf["report_all_ways"] = val == "yes"
        elif section in conf["layers"]:
            lcfg = conf["layers"][section]
            if key in ("attributes", "unsignificant", "ignore"):
                lcfg[key] = val.split(",")
            elif key == "all_tags":
                lcfg["all_tags"] = val == "yes"
            elif key == "other_tags":
                lcfg["other_tags"] = val == "yes"
    return conf


# ---------------------------------------------------------------------------
# Protobuf wire decode (field numbers = the public OSM PBF spec,
# osm_parser.cpp:141,454-458,792-797,934-938,1096-1102,1303-1307,1363-1368,
# 1486-1488)
# ---------------------------------------------------------------------------

def _uvarint(buf, pos: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if b < 0x80:
            return val, pos
        shift += 7


def _fields(buf) -> Iterator[tuple[int, object]]:
    """Iterate (field_number, value) over one message; wiretype 0 ->
    int, 2 -> memoryview, 1/5 -> fixed bytes."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        wt = key & 7
        if wt == 0:
            v, pos = _uvarint(buf, pos)
        elif wt == 2:
            ln, pos = _uvarint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            v = buf[pos:pos + 4]
            pos += 4
        elif wt == 1:
            v = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported protobuf wiretype {wt}")
        yield key >> 3, v


def _packed(buf) -> np.ndarray:
    """Vectorized packed-varint decode: continuation bits mark ends;
    <=10 shift/or passes regardless of count."""
    b = np.frombuffer(buf, np.uint8)
    if len(b) == 0:
        return np.zeros(0, np.int64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    vals = np.zeros(len(ends), np.uint64)
    for k in range(int(lens.max())):
        m = lens > k
        vals[m] |= ((b[starts[m] + k].astype(np.uint64) & np.uint64(0x7F))
                    << np.uint64(7 * k))
    return vals.view(np.int64)


def _zigzag(a: np.ndarray) -> np.ndarray:
    return (a.view(np.uint64) >> np.uint64(1)).view(np.int64) ^ -(a & 1)


def _to7(off: int, gran: int, raw: np.ndarray) -> np.ndarray:
    """Nanodegrees -> the reference's 1e-7-degree ints."""
    if off % 100 == 0 and gran % 100 == 0:
        return off // 100 + (gran // 100) * raw
    return np.round((off + gran * raw) / 100.0).astype(np.int64)


def scan_pbf(path: str) -> list[tuple[str, int, int]]:
    """Driver-side blob index: (type, data offset, data size) per blob.
    Reads only the 4-byte length + BlobHeader per blob, seeking over
    the payloads."""
    blobs = []
    with open(path, "rb") as fh:
        while True:
            hd = fh.read(4)
            if len(hd) < 4:
                break
            (hlen,) = struct.unpack(">I", hd)
            bh = fh.read(hlen)
            if len(bh) < hlen:
                raise ValueError("truncated PBF BlobHeader")
            btype, dsize = None, 0
            for fno, v in _fields(memoryview(bh)):
                if fno == 1:
                    btype = bytes(v).decode()
                elif fno == 3:
                    dsize = v
            off = fh.tell()
            blobs.append((btype, off, dsize))
            fh.seek(off + dsize)
    if not blobs or blobs[0][0] != "OSMHeader":
        raise ValueError("not an OSM PBF file")
    return blobs


def _parse_block(data: bytes) -> tuple[list, list, list]:
    """One OSMData blob -> (node rows, way rows, relation rows)."""
    raw = z = None
    for fno, v in _fields(memoryview(data)):
        if fno == 1:
            raw = bytes(v)
        elif fno == 3:
            z = bytes(v)
    if raw is None:
        if z is None:
            raise ValueError("PBF blob has no raw/zlib payload")
        raw = zlib.decompress(z)
    strings: list[str] = []
    groups = []
    gran, lat_off, lon_off = 100, 0, 0
    for fno, v in _fields(memoryview(raw)):
        if fno == 1:
            for f2, s in _fields(v):
                if f2 == 1:
                    strings.append(bytes(s).decode("utf-8"))
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            gran = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v
    nodes, ways, rels = [], [], []
    for g in groups:
        for fno, v in _fields(g):
            if fno == 2:  # DenseNodes
                ids = lats = lons = kv = None
                for f2, p in _fields(v):
                    if f2 == 1:
                        ids = np.cumsum(_zigzag(_packed(p)))
                    elif f2 == 8:
                        lats = np.cumsum(_zigzag(_packed(p)))
                    elif f2 == 9:
                        lons = np.cumsum(_zigzag(_packed(p)))
                    elif f2 == 10:
                        kv = _packed(p)
                if ids is None:
                    continue
                lon7 = _to7(lon_off, gran, lons)
                lat7 = _to7(lat_off, gran, lats)
                tags_per = [[] for _ in range(len(ids))]
                if kv is not None and len(kv):
                    node_i = 0
                    j = 0
                    while j < len(kv):
                        if kv[j] == 0:
                            node_i += 1
                            j += 1
                        else:
                            tags_per[node_i].append(
                                {"k": strings[kv[j]],
                                 "v": strings[kv[j + 1]]})
                            j += 2
                nodes.extend(
                    (int(ids[i]), int(lon7[i]), int(lat7[i]), tags_per[i])
                    for i in range(len(ids)))
            elif fno == 1:  # plain Node
                nid = lat = lon = 0
                keys = vals = np.zeros(0, np.int64)
                for f2, p in _fields(v):
                    if f2 == 1:
                        nid = p
                    elif f2 == 7:
                        lat = _zigzag(np.array([p]))[0]
                    elif f2 == 8:
                        lon = _zigzag(np.array([p]))[0]
                    elif f2 == 9:
                        keys = _packed(p)
                    elif f2 == 10:
                        vals = _packed(p)
                nodes.append((int(nid),
                              int(_to7(lon_off, gran,
                                       np.array([lon], np.int64))[0]),
                              int(_to7(lat_off, gran,
                                       np.array([lat], np.int64))[0]),
                              [{"k": strings[k], "v": strings[w]}
                               for k, w in zip(keys, vals)]))
            elif fno == 3:  # Way
                wid = 0
                keys = vals = refs = np.zeros(0, np.int64)
                for f2, p in _fields(v):
                    if f2 == 1:
                        wid = p
                    elif f2 == 2:
                        keys = _packed(p)
                    elif f2 == 3:
                        vals = _packed(p)
                    elif f2 == 8:
                        refs = np.cumsum(_zigzag(_packed(p)))
                ways.append((int(wid), [int(r) for r in refs],
                             [{"k": strings[k], "v": strings[w]}
                              for k, w in zip(keys, vals)]))
            elif fno == 4:  # Relation
                rid = 0
                keys = vals = roles = mids = mtypes = np.zeros(0, np.int64)
                for f2, p in _fields(v):
                    if f2 == 1:
                        rid = p
                    elif f2 == 2:
                        keys = _packed(p)
                    elif f2 == 3:
                        vals = _packed(p)
                    elif f2 == 8:
                        roles = _packed(p)
                    elif f2 == 9:
                        mids = np.cumsum(_zigzag(_packed(p)))
                    elif f2 == 10:
                        mtypes = _packed(p)
                rels.append((int(rid), [int(t) for t in mtypes],
                             [int(m) for m in mids],
                             [strings[r] for r in roles],
                             [{"k": strings[k], "v": strings[w]}
                              for k, w in zip(keys, vals)]))
    return nodes, ways, rels


# ---------------------------------------------------------------------------
# Raw element tables
# ---------------------------------------------------------------------------

def read_osm_tables(spark: SparkSession, path: str
                    ) -> dict[str, DataFrame]:
    """(nodes, ways, relations) raw tables. PBF: distributed blob
    parse; XML: driver parse (sidecar scale)."""
    head = open(path, "rb").read(64)
    if head[:5] == b"<?xml" or b"<osm" in head:
        return _read_osm_xml(spark, path)
    blobs = [(off, size) for typ, off, size in scan_pbf(path)
             if typ == "OSMData"]
    bdf = spark.createDataFrame(pd.DataFrame(blobs,
                                             columns=["off", "size"]))

    def parse(kind: int, schema: T.StructType):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = [f.name for f in schema]
            with open(path, "rb") as fh:
                for pdf in batches:
                    rows = []
                    for off, size in zip(pdf["off"], pdf["size"]):
                        fh.seek(int(off))
                        parsed = _parse_block(fh.read(int(size)))
                        rows.extend(parsed[kind])
                    yield pd.DataFrame(rows, columns=cols)
        return bdf.mapInPandas(run, schema=schema)

    return {"nodes": parse(0, _NODE_SCHEMA), "ways": parse(1, _WAY_SCHEMA),
            "relations": parse(2, _REL_SCHEMA)}


def _read_osm_xml(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    import xml.etree.ElementTree as ET
    parser = ET.XMLParser()
    # the reference rejects entity-expansion bombs (ogr_osm_10); the
    # stdlib parser with entity definitions disabled does the same
    nodes, ways, rels = [], [], []
    root = ET.parse(path, parser=parser).getroot()
    if root.tag != "osm":
        raise ValueError("not an OSM XML file")

    def tags_of(el):
        return [{"k": t.get("k"), "v": t.get("v")}
                for t in el if t.tag == "tag"]

    def to7(s):
        d = float(s)
        return int(d * 1e7 + (0.5 if d >= 0 else -0.5))

    mt = {"node": 0, "way": 1, "relation": 2}
    for el in root:
        if el.tag == "node":
            nodes.append((int(el.get("id")), to7(el.get("lon")),
                          to7(el.get("lat")), tags_of(el)))
        elif el.tag == "way":
            ways.append((int(el.get("id")),
                         [int(nd.get("ref")) for nd in el
                          if nd.tag == "nd"], tags_of(el)))
        elif el.tag == "relation":
            members = [(mt.get(m.get("type"), 0), int(m.get("ref")),
                        m.get("role") or "")
                       for m in el if m.tag == "member"]
            rels.append((int(el.get("id")), [m[0] for m in members],
                         [m[1] for m in members], [m[2] for m in members],
                         tags_of(el)))
    return {
        "nodes": spark.createDataFrame(nodes, _NODE_SCHEMA),
        "ways": spark.createDataFrame(ways, _WAY_SCHEMA)
        if ways else spark.createDataFrame([], _WAY_SCHEMA),
        "relations": spark.createDataFrame(rels, _REL_SCHEMA)
        if rels else spark.createDataFrame([], _REL_SCHEMA),
    }


# ---------------------------------------------------------------------------
# Column helpers (all JVM-side)
# ---------------------------------------------------------------------------

def _tagval(tags, key: str):
    """First value of tag `key`, else null."""
    return F.get(F.filter(tags, lambda t: t["k"] == key), 0)["v"]


def _hstore(tags, attributes: list[str], ignore: list[str],
            include_attrs: bool = False):
    """other_tags/all_tags hstore column (ogrosmlayer.cpp:516-533,
    560-583): '"k"=>"v"' comma-joined in tag order; '"' and '\\'
    escaped; keys in `ignore` (exact, or by 'prefix:' entry) dropped;
    attribute keys dropped unless all_tags."""
    ign = F.array(*[F.lit(k) for k in ignore])
    attrs = F.array(*[F.lit(a) for a in attributes])

    def esc(c):
        return F.concat(F.lit('"'),
                        F.regexp_replace(c, r'(["\\])', r'\\$1'),
                        F.lit('"'))

    def keep(t):
        k = t["k"]
        pref = F.when(k.contains(":"),
                      F.concat(F.substring_index(k, ":", 1), F.lit(":"))
                      ).otherwise(k)
        ok = (~F.array_contains(ign, k)) & (~F.array_contains(ign, pref))
        if not include_attrs:
            ok = ok & (~F.array_contains(attrs, k))
        return ok

    joined = F.array_join(
        F.transform(F.filter(tags, keep),
                    lambda t: F.concat(esc(t["k"]), F.lit("=>"),
                                       esc(t["v"]))), ",")
    return F.when(joined == "", None).otherwise(joined)


def _is_area(tags, closed, cwap: list[str]):
    """Faithful ordered walk of the closed-way area rule
    (ogrosmdatasource.cpp:1834-1858): area=no stops and clears,
    area=yes or any closed_ways_are_polygons key sets."""
    cw = F.array(*[F.lit(k) for k in cwap])
    acc = F.aggregate(
        tags,
        F.struct(F.lit(False).alias("area"), F.lit(False).alias("stop")),
        lambda a, t: F.when(a["stop"], a).otherwise(
            F.when((t["k"] == "area") & (t["v"] == "no"),
                   F.struct(F.lit(False).alias("area"),
                            F.lit(True).alias("stop")))
            .when((t["k"] == "area") & (t["v"] == "yes"),
                  F.struct(F.lit(True).alias("area"),
                           a["stop"].alias("stop")))
            .when(F.array_contains(cw, t["k"]),
                  F.struct(F.lit(True).alias("area"),
                           a["stop"].alias("stop")))
            .otherwise(a)))
    return closed & acc["area"]


_Z_CLASS = {"minor": 3, "road": 3, "unclassified": 3, "residential": 3,
            "tertiary_link": 4, "tertiary": 4, "secondary_link": 6,
            "secondary": 6, "primary_link": 7, "primary": 7,
            "trunk_link": 8, "trunk": 8, "motorway_link": 9, "motorway": 9}


def _z_order(tags):
    """osmconf.ini z_order_sql formula as column math."""
    hw = _tagval(tags, "highway")
    z = F.lit(0)
    for name, val in _Z_CLASS.items():
        z = F.when(hw == name, val).otherwise(z)
    z = z + F.when(_tagval(tags, "bridge").isin("yes", "true", "1"), 10
                   ).otherwise(0)
    z = z + F.when(_tagval(tags, "tunnel").isin("yes", "true", "1"), -10
                   ).otherwise(0)
    z = z + F.when(_tagval(tags, "railway").isNotNull(), 5).otherwise(0)
    lyr = _tagval(tags, "layer")
    z = z + F.when(lyr.isNotNull(),
                   10 * F.coalesce(lyr.cast("int"), F.lit(0))).otherwise(0)
    return z.cast("int")


# ---------------------------------------------------------------------------
# WKB assembly kernels
# ---------------------------------------------------------------------------

def _wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_linestring(xs, ys) -> bytes:
    out = struct.pack("<BII", 1, 2, len(xs))
    return out + np.column_stack([xs, ys]).astype("<f8").tobytes()


def _wkb_polygon(rings) -> bytes:
    out = struct.pack("<BII", 1, 3, len(rings))
    for xs, ys in rings:
        out += struct.pack("<I", len(xs))
        out += np.column_stack([xs, ys]).astype("<f8").tobytes()
    return out


def _wkb_multi(code: int, parts: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, code, len(parts)) + b"".join(parts)


def _ring_contains(rxs, rys, x, y) -> bool:
    """Ray cast (even-odd), matching OGRLinearRing::isPointInRing."""
    inside = False
    n = len(rxs)
    j = n - 1
    for i in range(n):
        if ((rys[i] > y) != (rys[j] > y)) and \
                (x < (rxs[j] - rxs[i]) * (y - rys[i]) /
                 (rys[j] - rys[i]) + rxs[i]):
            inside = not inside
        j = i
    return inside


def _chain_rings(edges: list) -> list:
    """OGRBuildPolygonFromEdges(autoclose) analog: greedy endpoint
    chaining of open member ways into closed rings."""
    pool = [(list(xs), list(ys)) for xs, ys in edges]
    rings = []
    while pool:
        xs, ys = pool.pop(0)
        changed = True
        while changed and (xs[0] != xs[-1] or ys[0] != ys[-1]):
            changed = False
            for i, (exs, eys) in enumerate(pool):
                if exs[0] == xs[-1] and eys[0] == ys[-1]:
                    xs += exs[1:]
                    ys += eys[1:]
                elif exs[-1] == xs[-1] and eys[-1] == ys[-1]:
                    xs += exs[-2::-1]
                    ys += eys[-2::-1]
                else:
                    continue
                pool.pop(i)
                changed = True
                break
        if xs[0] != xs[-1] or ys[0] != ys[-1]:
            xs.append(xs[0])
            ys.append(ys[0])
        if len(xs) >= 4:
            rings.append((xs, ys))
    return rings


def _organize_rings(rings: list) -> list:
    """organizePolygons(METHOD=DEFAULT) analog: even-odd containment
    nesting — a ring inside an odd number of other rings is a hole of
    its innermost container."""
    n = len(rings)
    depth = [0] * n
    parent = [-1] * n
    for i in range(n):
        for j in range(n):
            if i != j and _ring_contains(rings[j][0], rings[j][1],
                                         rings[i][0][0], rings[i][1][0]):
                depth[i] += 1
    polys = []
    for i in range(n):
        if depth[i] % 2 == 0:
            continue
        best, bestd = -1, -1
        for j in range(n):
            if j != i and depth[j] % 2 == 0 and depth[j] > bestd and \
                    _ring_contains(rings[j][0], rings[j][1],
                                   rings[i][0][0], rings[i][1][0]):
                best, bestd = j, depth[j]
        parent[i] = best
    for i in range(n):
        if depth[i] % 2 == 0:
            holes = [rings[j] for j in range(n) if parent[j] == i]
            polys.append([rings[i]] + holes)
    return polys


# ---------------------------------------------------------------------------
# Layer assembly
# ---------------------------------------------------------------------------

_D = 1e-7


def _resolved_ways(tables: dict[str, DataFrame]) -> DataFrame:
    """Ways with node refs resolved to ordered coordinate arrays (the
    planet-scale shuffle: explode refs -> join nodes -> regroup).
    Missing nodes drop silently (ogrosmdatasource.cpp keeps the found
    subset); ways with <2 resolved points are discarded like the
    reference's 'Way with %d nodes' path."""
    ways = tables["ways"].filter(F.size("refs") >= 2)
    idx = ways.select("id", F.posexplode("refs").alias("pos", "ref"))
    nd = tables["nodes"].select(F.col("id").alias("ref"), "lon", "lat")
    pts = (idx.join(nd, "ref")
           .groupBy("id")
           .agg(F.array_sort(F.collect_list(
               F.struct("pos", "lon", "lat"))).alias("pts"))
           .select("id",
                   F.transform("pts", lambda p: p["lon"]).alias("xs"),
                   F.transform("pts", lambda p: p["lat"]).alias("ys")))
    return (ways.join(pts, "id")
            .filter(F.size("xs") >= 2)
            .withColumn("closed",
                        F.element_at("refs", 1) ==
                        F.element_at("refs", -1)))


_LINE_GEOM_T = T.BinaryType()


@F.pandas_udf(_LINE_GEOM_T)
def _linestring_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
    return pd.Series(
        [_wkb_linestring(np.asarray(x, np.float64) * _D,
                         np.asarray(y, np.float64) * _D)
         for x, y in zip(xs, ys)])


@F.pandas_udf(_LINE_GEOM_T)
def _ring_polygon_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Closed standalone way -> MULTIPOLYGON of one ring (re-closed)."""
    out = []
    for x, y in zip(xs, ys):
        lx, ly = list(x), list(y)
        if lx[0] != lx[-1] or ly[0] != ly[-1]:
            lx.append(lx[0])
            ly.append(ly[0])
        rx = np.asarray(lx, np.float64) * _D
        ry = np.asarray(ly, np.float64) * _D
        out.append(_wkb_multi(6, [_wkb_polygon([(rx, ry)])]))
    return pd.Series(out)


def _with_fields(df: DataFrame, layer: str, conf: dict, tags="tags"):
    cfg = conf["layers"][layer]
    cols = []
    for a in cfg["attributes"]:
        cols.append(_tagval(F.col(tags), a).alias(a.replace(":", "_")))
    if cfg.get("all_tags"):
        cols.append(_hstore(F.col(tags), cfg["attributes"], cfg["ignore"],
                            include_attrs=True).alias("all_tags"))
    elif cfg.get("other_tags", True):
        cols.append(_hstore(F.col(tags), cfg["attributes"],
                            cfg["ignore"]).alias("other_tags"))
    return cols


def read_osm(spark: SparkSession, path: str, layer: str = "points",
             config_path: str | None = None) -> DataFrame:
    """One of the reference's five OSM layers as a DataFrame with a
    WKB `geometry` column (EPSG:4326)."""
    conf = (load_osmconf(config_path) if config_path else
            {"closed_ways_are_polygons": list(CLOSED_WAYS_ARE_POLYGONS),
             "report_all_nodes": False, "report_all_ways": False,
             "layers": {k: dict(v) for k, v in LAYER_CONFIG.items()}})
    tables = read_osm_tables(spark, path)
    if layer == "points":
        return _points_layer(tables, conf)
    rw = _resolved_ways(tables).cache()
    if layer == "lines":
        return _lines_layer(rw, conf)
    if layer == "multipolygons":
        return _multipolygons_layer(tables, rw, conf)
    if layer in ("multilinestrings", "other_relations"):
        return _relation_collection_layer(tables, rw, conf, layer)
    raise ValueError(f"unknown OSM layer {layer!r}")


@F.pandas_udf(T.BinaryType())
def _point_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series([_wkb_point(x * _D, y * _D)
                      for x, y in zip(lon, lat)])


def _points_layer(tables, conf) -> DataFrame:
    cfg = conf["layers"]["points"]
    nodes = tables["nodes"]
    if not conf["report_all_nodes"]:
        unsig = F.array(*[F.lit(k) for k in cfg["unsignificant"]])
        nodes = nodes.filter(F.exists(
            "tags", lambda t: ~F.array_contains(unsig, t["k"])))
    return nodes.select(
        F.col("id").cast("string").alias("osm_id"),
        *_with_fields(nodes, "points", conf),
        _point_udf("lon", "lat").alias("geometry"))


def _lines_layer(rw: DataFrame, conf) -> DataFrame:
    cwap = conf["closed_ways_are_polygons"]
    lines = rw.withColumn(
        "is_area", _is_area(F.col("tags"), F.col("closed"), cwap))
    if not conf["report_all_ways"]:
        lines = lines.filter(F.size("tags") > 0)
    lines = lines.filter(~F.col("is_area"))
    return lines.select(
        F.col("id").cast("string").alias("osm_id"),
        *_with_fields(lines, "lines", conf),
        _z_order(F.col("tags")).alias("z_order"),
        _linestring_udf("xs", "ys").alias("geometry"))


def _mp_relations(tables: DataFrame) -> DataFrame:
    """Relations routed to multipolygons (type in multipolygon,
    boundary), with member arrays zipped."""
    rels = tables["relations"]
    typ = _tagval(F.col("tags"), "type")
    return (rels.withColumn("rtype", typ)
            .withColumn("route",
                        F.col("rtype").isin("route", "multilinestring"))
            .withColumn("mp",
                        F.col("rtype").isin("multipolygon", "boundary")))


def _rel_way_members(rels: DataFrame, rw: DataFrame) -> DataFrame:
    """Explode relation way members (role != subarea) and join way
    geometries; `found` marks resolution."""
    m = rels.select(
        "id", "tags", "rtype",
        F.posexplode(F.arrays_zip("mtypes", "mrefs", "mroles"))
        .alias("mpos", "m"))
    m = (m.filter((F.col("m.mtypes") == 1) &
                  (F.col("m.mroles") != "subarea"))
         .select("id", "tags", "rtype", "mpos",
                 F.col("m.mrefs").alias("wid"),
                 F.col("m.mroles").alias("role")))
    wg = rw.select(F.col("id").alias("wid"),
                   F.col("xs").alias("wxs"), F.col("ys").alias("wys"),
                   F.col("closed").alias("wclosed"),
                   F.col("tags").alias("wtags"))
    return m.join(wg, "wid", "left")


_MP_OUT = T.StructType([
    T.StructField("osm_id", T.StringType()),
    T.StructField("tags", _TAGS_T),
    T.StructField("geometry", T.BinaryType())])


def _multipolygons_layer(tables, rw, conf) -> DataFrame:
    rels = _mp_relations(tables).filter(F.col("mp"))
    members = _rel_way_members(rels, rw)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(key[0])
        if pdf["wxs"].isna().any():
            return pd.DataFrame(columns=["osm_id", "tags", "geometry"])
        pdf = pdf.sort_values("mpos")
        tags = pdf.iloc[0]["tags"]
        interesting = any(t["k"] not in ("type", "created_by")
                          for t in tags)
        rings, edges = [], []
        inherited = None
        for r in pdf.itertuples(index=False):
            xs = np.asarray(r.wxs, np.float64) * _D
            ys = np.asarray(r.wys, np.float64) * _D
            closed = xs[0] == xs[-1] and ys[0] == ys[-1]
            if not interesting and inherited is None and \
                    r.role == "outer":
                inherited = list(r.wtags) + [
                    {"k": "type", "v": next(
                        (t["v"] for t in tags if t["k"] == "type"),
                        None)}]
            if closed:
                rings.append((list(xs), list(ys)))
            else:
                edges.append((xs, ys))
        rings.extend(_chain_rings(edges))
        polys = _organize_rings(rings)
        if not polys:
            return pd.DataFrame(columns=["osm_id", "tags", "geometry"])
        wkb = _wkb_multi(6, [_wkb_polygon(
            [(np.asarray(xs), np.asarray(ys)) for xs, ys in p])
            for p in polys])
        out_tags = (inherited if (not interesting and inherited)
                    else list(tags))
        return pd.DataFrame([(str(rid), out_tags, wkb)],
                            columns=["osm_id", "tags", "geometry"])

    rel_feats = members.groupBy("id").applyInPandas(assemble, _MP_OUT)

    # standalone closed ways with tags, minus closed outer members of
    # complete multipolygon relations (:2237-2243)
    cwap = conf["closed_ways_are_polygons"]
    area_ways = (rw.withColumn("is_area",
                               _is_area(F.col("tags"), F.col("closed"),
                                        cwap))
                 .filter("is_area")
                 .withColumn("tags", F.filter(
                     "tags", lambda t: ~t["k"].isin(*_AREA_WAY_DROP)))
                 .filter(F.size("tags") > 0))
    complete = (members.groupBy("id")
                .agg(F.max(F.col("wxs").isNull()).alias("missing"))
                .filter(~F.col("missing")).select("id"))
    consumed = (members.join(complete, "id")
                .filter((F.col("role") == "outer") & F.col("wclosed"))
                .select(F.col("wid").alias("id")).distinct())
    standalone = (area_ways.join(consumed, "id", "left_anti")
                  .select(F.col("id").cast("string").alias("osm_way_id"),
                          "tags",
                          _ring_polygon_udf("xs", "ys").alias("geometry")))

    cfg_cols_rel = _with_fields(rel_feats, "multipolygons", conf)
    rel_out = rel_feats.select(
        "osm_id", F.lit(None).cast("string").alias("osm_way_id"),
        *cfg_cols_rel, "geometry")
    way_out = standalone.select(
        F.lit(None).cast("string").alias("osm_id"), "osm_way_id",
        *_with_fields(standalone, "multipolygons", conf), "geometry")
    return rel_out.unionByName(way_out)


def _relation_collection_layer(tables, rw, conf, layer) -> DataFrame:
    rels = _mp_relations(tables)
    rels = rels.filter(F.col("route") if layer == "multilinestrings"
                       else ~(F.col("route") | F.col("mp")))
    members = _rel_way_members(rels, rw)
    mls = layer == "multilinestrings"

    if not mls:
        # node members become points in the collection
        nm = rels.select(
            "id", F.posexplode(F.arrays_zip("mtypes", "mrefs", "mroles"))
            .alias("mpos", "m")).filter(F.col("m.mtypes") == 0).select(
            "id", "mpos", F.col("m.mrefs").alias("nid"))
        nm = nm.join(tables["nodes"].select(F.col("id").alias("nid"),
                                            "lon", "lat"), "nid")
    else:
        nm = None

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(key[0])
        parts = []
        tags = None
        for r in pdf.sort_values("mpos").itertuples(index=False):
            if tags is None and isinstance(r.tags, (list, np.ndarray)):
                tags = list(r.tags)
            if r.kind == 0:
                parts.append(_wkb_point(r.px, r.py))
            elif r.wxs is not None and not (isinstance(r.wxs, float)):
                parts.append(_wkb_linestring(
                    np.asarray(r.wxs, np.float64) * _D,
                    np.asarray(r.wys, np.float64) * _D))
        if not parts:
            return pd.DataFrame(columns=["osm_id", "tags", "geometry"])
        wkb = _wkb_multi(5 if mls else 7, parts)
        return pd.DataFrame([(str(rid), tags or [], wkb)],
                            columns=["osm_id", "tags", "geometry"])

    wm = members.select("id", "tags", "mpos", F.lit(1).alias("kind"),
                        F.lit(None).cast("double").alias("px"),
                        F.lit(None).cast("double").alias("py"),
                        "wxs", "wys")
    if nm is not None:
        nmp = nm.select("id", F.lit(None).cast(_TAGS_T).alias("tags"),
                        "mpos", F.lit(0).alias("kind"),
                        (F.col("lon") * _D).alias("px"),
                        (F.col("lat") * _D).alias("py"),
                        F.lit(None).cast(T.ArrayType(T.LongType()))
                        .alias("wxs"),
                        F.lit(None).cast(T.ArrayType(T.LongType()))
                        .alias("wys"))
        allm = wm.unionByName(nmp)
    else:
        allm = wm
    # re-attach relation tags for rows that lost them
    allm = (allm.drop("tags")
            .join(rels.select("id", "tags"), "id"))
    feats = allm.groupBy("id").applyInPandas(assemble, _MP_OUT)
    return feats.select("osm_id", *_with_fields(feats, layer, conf),
                        "geometry")
