"""NAS (ALKIS — German cadastre GML dialect) reader —
gdal/ogr/ogrsf_frmts/nas/.

Reference semantics:
- Feature elements are children of containers whose local name ends
  with ``Insert``, ``featureMember``, or ``Replace``
  (nasreader.cpp IsFeatureElement :360-384); each distinct element
  name becomes a layer.
- ``wfs:Delete``/``wfs:Update`` operations synthesize rows in a
  ``Delete`` layer: the operation's ``typeName`` attribute plus the
  ``ogc:Filter/ogc:FeatureId`` fid, with ``context`` = the operation
  name (nashandler.cpp :220-246, :322-340).
- ``wfsext:Replace`` synthesizes the same Delete row with ``context``
  = ``Replace``, ``typeName`` = the replaced element's name,
  ``replacedBy`` = the replacing feature's gml:id, and the element's
  ``safeToIgnore`` attribute (nashandler.cpp :249-254, :363-383).
- The datasource always appends an ``ALKIS_beziehungen`` relation
  layer (ogrnasdatasource.cpp :175-185, relations collected from
  ``zeigtAuf*``-style xlink properties); the ``Delete`` layer is kept
  last.
- Simple nested properties flatten to their leaf element name
  (``zustaendigeStelle/AX_Dienststelle_Schluessel/stelle`` -> field
  ``stelle``); ``gml:id`` -> ``gml_id``; geometry elements become the
  feature geometry.

Driver-side XML parse (NAS transaction files are per-municipality
deltas — metadata-scale; same stance as the other small single-file
XML vector formats), then a distributed DataFrame.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_GML_ID = "{http://www.opengis.net/gml/3.2}id"
_GML_ID_31 = "{http://www.opengis.net/gml}id"

_GEOM_TAGS = ("Point", "LineString", "Polygon", "MultiPoint",
              "MultiLineString", "MultiPolygon", "MultiSurface",
              "MultiCurve", "Curve", "Surface")


def _ln(tag) -> str:
    return tag.split("}", 1)[-1]


class NASFile:
    """Parsed NAS transaction file: feature classes in document order,
    Delete-layer rows, and xlink relations."""

    def __init__(self, path: str):
        from gdal_spark.sources.formats import _gml_geom_wkb

        root = ET.parse(path).getroot()
        self.classes: dict[str, list[dict]] = {}
        self.class_fields: dict[str, list[str]] = {}
        self.relations: list[tuple[str, str, str]] = []
        self.deletes: list[dict] = []

        def add_feature(el):
            name = _ln(el.tag)
            row = {"gml_id": el.get(_GML_ID) or el.get(_GML_ID_31)}
            fields = self.class_fields.setdefault(name, ["gml_id"])
            geom = None
            stack = list(el)
            while stack:
                c = stack.pop(0)
                t = _ln(c.tag)
                if t in _GEOM_TAGS:
                    geom = _gml_geom_wkb(c)
                    continue
                kids = list(c)
                if kids:
                    stack = kids + stack
                    continue
                href = c.get("{http://www.w3.org/1999/xlink}href")
                if href is not None:
                    # relation property (ALKIS_beziehungen source)
                    self.relations.append(
                        (row.get("gml_id") or "", t,
                         href.split(":")[-1]))
                    continue
                if c.text is None or not c.text.strip():
                    continue
                if t not in fields:
                    fields.append(t)
                if t not in row:          # first value wins
                    row[t] = c.text.strip()
            row["geometry"] = geom
            self.classes.setdefault(name, []).append(row)
            return row

        def walk(el):
            last = _ln(el.tag)
            is_container = (last.endswith("Insert")
                            or last.endswith("featureMember")
                            or last.endswith("Replace"))
            if last in ("Delete", "Update"):
                fid = None
                for f in el.iter():
                    if _ln(f.tag) == "FeatureId":
                        fid = f.get("fid")
                        break
                self.deletes.append(
                    {"context": last,
                     "typeName": el.get("typeName"),
                     "FeatureId": fid,
                     "replacedBy": None, "safeToIgnore": None})
                self.classes.setdefault("Delete", [])
                return
            if last == "Replace":
                replaced, fid = None, None
                for c in el:
                    t = _ln(c.tag)
                    if t == "Filter":
                        for f in c.iter():
                            if _ln(f.tag) == "FeatureId":
                                fid = f.get("fid")
                    else:
                        replaced = add_feature(c)
                        replaced_name = t
                self.deletes.append(
                    {"context": "Replace",
                     "typeName": replaced_name if replaced else None,
                     "FeatureId": fid,
                     "replacedBy": (replaced or {}).get("gml_id"),
                     "safeToIgnore": el.get("safeToIgnore")})
                self.classes.setdefault("Delete", [])
                return
            for c in el:
                if is_container:
                    add_feature(c)
                else:
                    walk(c)

        for c in root:
            walk(c)

    def layers(self) -> list[str]:
        """Class layers in document order + ALKIS_beziehungen, with
        Delete kept last (ogrnasdatasource.cpp:178-185)."""
        names = [n for n in self.classes if n != "Delete"]
        names.append("ALKIS_beziehungen")
        if "Delete" in self.classes:
            names.append("Delete")
        return names


def nas_layers(path: str) -> list[str]:
    return NASFile(path).layers()


def _typed(values: list[str | None]):
    """int -> float -> string promotion over a column's values."""
    kind = "int"
    for v in values:
        if v is None:
            continue
        try:
            int(v)
        except ValueError:
            kind = "float"
            try:
                float(v)
            except ValueError:
                return "string", values
    if kind == "int":
        return "long", [None if v is None else int(v) for v in values]
    return "double", [None if v is None else float(v) for v in values]


def read_nas(spark: SparkSession, path: str, layer: str) -> DataFrame:
    nas = NASFile(path)
    if layer == "Delete":
        rows = [(d["context"], d["typeName"], d["FeatureId"],
                 d["replacedBy"], d["safeToIgnore"])
                for d in nas.deletes]
        return spark.createDataFrame(
            rows, "context string, typeName string, FeatureId string, "
                  "replacedBy string, safeToIgnore string")
    if layer == "ALKIS_beziehungen":
        return spark.createDataFrame(
            nas.relations or [],
            "beziehung_von string, beziehungsart string, "
            "beziehung_zu string")
    if layer not in nas.classes:
        raise ValueError(f"{path}: no NAS layer {layer!r}; have "
                         f"{nas.layers()}")
    fields = nas.class_fields[layer]
    feats = nas.classes[layer]
    cols, types = [], []
    for f in fields:
        t, vals = _typed([row.get(f) for row in feats])
        cols.append(vals)
        types.append(t)
    schema = ", ".join(
        [f"`{f}` {'string' if f == 'gml_id' else t}"
         for f, t in zip(fields, types)]) + ", geometry binary"
    data = [tuple((row.get(f) if f == "gml_id" else cols[i][k])
                  for i, f in enumerate(fields)) + (row["geometry"],)
            for k, row in enumerate(feats)]
    return spark.createDataFrame(data, schema)
