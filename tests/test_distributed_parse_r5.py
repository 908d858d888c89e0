"""Round 5: executor-side parses for the next tier of single-file
vector formats (GeoRSS, JML) — must be row-identical to the driver
parses over the reference's own fixtures."""

import os

import pytest

DATA = "/root/reference/autotest/ogr/data/"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA + "test.jml"),
    reason="reference autotest data not present")


@pytest.mark.parametrize("fn", ["test_georss_simple.xml",
                                "test_georss_gml.xml",
                                "atom_rfc_sample.xml"])
def test_georss_distributed_equivalence(spark, fn):
    from gdal_spark.sources import formats as FMT
    a = FMT.read_georss(spark, DATA + fn).orderBy("fid")
    b = FMT.read_georss_distributed(spark, DATA + fn).orderBy("fid")
    assert a.columns == b.columns
    ra, rb = a.collect(), b.collect()
    assert len(ra) == len(rb) and len(ra) > 0
    assert all(tuple(x) == tuple(y) for x, y in zip(ra, rb))


def test_jml_distributed_equivalence(spark):
    from gdal_spark.sources import formats as FMT
    a = FMT.read_jml(spark, DATA + "test.jml").orderBy("fid").collect()
    b = FMT.read_jml_distributed(spark, DATA + "test.jml") \
        .orderBy("fid").collect()
    assert len(a) == len(b) == 3
    assert all(tuple(x) == tuple(y) for x, y in zip(a, b))


def test_georss_distributed_many_ranges(spark):
    # range boundaries inside elements must not lose or duplicate rows
    from gdal_spark.sources import formats as FMT
    fn = DATA + "test_georss_simple.xml"
    a = FMT.read_georss(spark, fn).count()
    for n in (2, 7, 64):
        assert FMT.read_georss_distributed(spark, fn, n_ranges=n) \
            .count() == a


def test_gtm_distributed_equivalence(spark):
    from gdal_spark.sources import formats as FMT
    p = DATA + "samplemap.gtm"
    a = FMT.read_gtm(spark, p, "waypoints").orderBy("fid").collect()
    b = FMT.read_gtm_distributed(spark, p).orderBy("fid").collect()
    assert len(a) == len(b) > 0
    assert all(tuple(x) == tuple(y) for x, y in zip(a, b))
