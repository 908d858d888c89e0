"""TerraSAR-X reader tests. The reference era has no tsx autotest
fixture (download-gated), so a synthetic MGD product exercises the
documented structure of tsxdataset.cpp: productComponents/imageData
band discovery by polLayer, GEOREF geolocation-grid GCPs, productInfo
metadata, and the identify rules."""

import numpy as np
import pytest

from gdal_spark.raster import formats as RF
from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.model import RasterMeta, from_array, to_array
from gdal_spark.raster.tsx import identify_tsx, parse_tsx, read_tsx

# no XML declaration: the reference identify requires the file to BEGIN
# with <level1Product (tsxdataset.cpp:284)
PRODUCT_XML = """<level1Product>
  <productComponents>
    <imageData><polLayer>HH</polLayer>
      <file><location><path>IMAGEDATA</path>
        <filename>IMAGE_HH.tif</filename></location></file></imageData>
    <imageData><polLayer>VV</polLayer>
      <file><location><path>IMAGEDATA</path>
        <filename>IMAGE_VV.tif</filename></location></file></imageData>
    <auxiliaryFile><type>GEOREF</type>
      <file><location><path></path>
        <filename>GEOREF.xml</filename></location></file></auxiliaryFile>
  </productComponents>
  <productInfo>
    <missionInfo><orbitCycle>12</orbitCycle><absOrbit>3401</absOrbit>
      <orbitDirection>ASCENDING</orbitDirection></missionInfo>
    <acquisitionInfo><imagingMode>SM</imagingMode></acquisitionInfo>
    <productVariantInfo><productVariant>MGD</productVariant>
    </productVariantInfo>
    <imageDataInfo><imageDataType>DETECTED</imageDataType>
      <imageRaster>
        <numberOfRows>24</numberOfRows>
        <numberOfColumns>18</numberOfColumns>
        <rowSpacing>1.25</rowSpacing>
        <columnSpacing>1.25</columnSpacing>
        <azimuthLooks>1</azimuthLooks><rangeLooks>1</rangeLooks>
      </imageRaster></imageDataInfo>
    <sceneInfo>
      <sceneID>T1</sceneID>
      <sceneAverageHeight>100</sceneAverageHeight>
      <sceneCenterCoord><azimuthTimeUTC>2008-01-01T00:00:00Z</azimuthTimeUTC>
        <refRow>12</refRow><refColumn>9</refColumn>
        <lat>48.5</lat><lon>11.5</lon></sceneCenterCoord>
    </sceneInfo>
  </productInfo>
</level1Product>
"""

GEOREF_XML = """<?xml version="1.0"?>
<geoReference>
  <referenceFrames><sphere><ellipsoidID>WGS84</ellipsoidID>
    <semiMajorAxis>6378137</semiMajorAxis>
    <semiMinorAxis>6356752.3142</semiMinorAxis></sphere></referenceFrames>
  <geolocationGrid>
    <numberOfGridPoints><total>2</total></numberOfGridPoints>
    <gridPoint><col>0</col><row>0</row><lon>11</lon><lat>49</lat></gridPoint>
    <gridPoint><col>18</col><row>24</row><lon>12</lon><lat>48</lat></gridPoint>
  </geolocationGrid>
</geoReference>
"""


@pytest.fixture(scope="module")
def tsx_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("tsx") / "TSX1_SAR__MGD_T1"
    (d / "IMAGEDATA").mkdir(parents=True)
    (d / "TSX1_SAR__MGD_T1.xml").write_text(PRODUCT_XML)
    (d / "GEOREF.xml").write_text(GEOREF_XML)
    y, x = np.mgrid[0:24, 0:18]
    for pol, mul in (("HH", 7), ("VV", 13)):
        a = ((x * mul + y * 3) % 900 + 1).astype("uint16")
        m = RasterMeta(f"im_{pol}", 18, 24, dtype="uint16", block=16)
        RF.write_geotiff(from_array(spark, a, m), m,
                         str(d / "IMAGEDATA" / f"IMAGE_{pol}.tif"))
    return str(d)


def test_identify(tsx_dir, tmp_path):
    assert identify_tsx(tsx_dir)
    assert identify_tsx(tsx_dir + "/TSX1_SAR__MGD_T1.xml")
    p = tmp_path / "whatever.xml"
    p.write_text(PRODUCT_XML)
    assert not identify_tsx(str(p))          # name rule


def test_parse(tsx_dir):
    info = parse_tsx(tsx_dir)
    assert (info["cols"], info["rows"]) == (18, 24)
    assert info["pixel_type"] == "uint16"
    assert [p for p, _ in info["bands"]] == ["HH", "VV"]
    md = info["metadata"]
    assert md["PRODUCT_VARIANT"] == "MGD"
    assert md["ORBIT_DIRECTION"] == "ASCENDING"
    assert md["IMAGING_MODE"] == "SM"
    assert md["ROW_SPACING"] == "1.25"
    # GEOREF grid wins over scene coords
    assert info["gcp_source"] == "GEOREF"
    assert info["gcps"][0] == (0.0, 0.0, 11.0, 49.0, 0.0)
    assert info["gcps"][1] == (18.0, 24.0, 12.0, 48.0, 0.0)


def test_read_bands(spark, tsx_dir):
    tiles, meta, info = read_tsx(spark, tsx_dir, block=16)
    assert (meta.width, meta.height) == (18, 24)
    y, x = np.mgrid[0:24, 0:18]
    for b, mul in ((0, 7), (1, 13)):
        want = ((x * mul + y * 3) % 900 + 1).astype("uint16")
        got = to_array(tiles, meta, band=b)
        assert got.dtype == np.uint16
        assert np.array_equal(got, want)
        assert py_checksum(got) == py_checksum(want)


def test_ssc_scene_gcps(tsx_dir, tmp_path):
    # SSC without GEOREF falls back to the scene centre/corner coords
    xml = PRODUCT_XML.replace("MGD", "SSC").replace(
        "<filename>GEOREF.xml</filename>", "<filename>absent.xml</filename>")
    d = tmp_path / "TSX1_SAR__SSC_T2"
    d.mkdir()
    (d / "TSX1_SAR__SSC_T2.xml").write_text(xml)
    info = parse_tsx(str(d))
    assert info["gcp_source"] == "SCENE_COORDS"
    assert info["gcps"] == [(9.0, 12.0, 11.5, 48.5, 100.0)]
