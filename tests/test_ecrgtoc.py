"""ECRG TOC reader vs the reference's autotest golden geotransform
(autotest/gdrivers/ecrgtoc.py ecrgtoc_1 — synthetic TOC.xml)."""

import pytest

from gdal_spark.raster.ecrgtoc import (ecrg_file_list, ecrg_subdatasets,
                                       frame_extent, from_base34,
                                       read_ecrg_toc, scale_from_string)

TOC_XML = """<Table_of_Contents>
  <file_header file_status="new">
    <file_name>TOC.xml</file_name>
  </file_header>
  <product product_title="ProductTitle">
    <disc id="DiscId">
      <frame_list number_of_frames="2">
        <scale size="1:500 K">
          <frame name="000000009s0013.lf2">
            <frame_path>clfc\\2</frame_path>
            <frame_version>001</frame_version>
            <frame_chart_type>lf</frame_chart_type>
            <frame_zone>2</frame_zone>
          </frame>
          <frame name="000000009t0013.lf2">
            <frame_path>clfc\\2</frame_path>
            <frame_version>001</frame_version>
            <frame_chart_type>lf</frame_chart_type>
            <frame_zone>2</frame_zone>
          </frame>
        </scale>
      </frame_list>
    </disc>
  </product>
</Table_of_Contents>"""

EXPECTED_GT = (-85.43147208121826, 0.00059486040609137061, 0.0,
               33.166986564299428, 0.0, -0.00044985604606525913)


@pytest.fixture()
def toc(tmp_path):
    p = str(tmp_path / "TOC.xml")
    with open(p, "w") as f:
        f.write(TOC_XML)
    return p


def test_scale_and_base34():
    assert scale_from_string("1:500 K") == 500000
    assert scale_from_string("1:1 M") == 1000000
    # i/o (and per the reference's table, n/p) are not base-34 digits
    assert from_base34("0000000010") == 34
    assert from_base34("000000009s") == 9 * 34 + 26


def test_mosaic_geotransform(toc):
    entries = read_ecrg_toc(toc)
    assert len(entries) == 1
    e = entries[0]
    assert (e.product, e.disc, e.scale) == \
        ("ProductTitle", "DiscId", 500000)
    gt, w, h = e.geotransform_and_size()
    for a, b in zip(gt, EXPECTED_GT):
        assert abs(a - b) < 1e-10, (gt, EXPECTED_GT)
    # two side-by-side frames: 2 x 2304 wide, 1 frame tall
    assert (w, h) == (2 * 2304, 2304)


def test_subdatasets_and_filelist(toc):
    assert ecrg_subdatasets(toc) == \
        [f"ECRG_TOC_ENTRY:ProductTitle:DiscId:{toc}"]
    fl = ecrg_file_list(toc)
    assert len(fl) == 3                       # TOC + 2 frames
    assert fl[1].endswith("clfc/2/000000009s0013.lf2")


def test_frame_extent_adjacency(toc):
    e = read_ecrg_toc(toc)[0]
    f1, f2 = e.frames
    # t = s+1 in base 34: frames horizontally adjacent
    assert abs(f1.extent[1] - f2.extent[0]) < 1e-12
    assert f1.extent[2] == f2.extent[2]
