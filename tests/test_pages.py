"""Pages source invariants (BASELINE.json input_hint + FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdal_spark.sources import pages as P


def test_schema_and_determinism(spark):
    df = P.pages(spark, 200)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {"url": "string", "warc_ts": "timestamp", "html": "binary",
                     "text": "string", "lang": "string"}
    # regenerating gives byte-identical rows (seed-free hash determinism)
    a = sorted((r["url"], r["text"], bytes(r["html"])) for r in df.collect())
    b = sorted((r["url"], r["text"], bytes(r["html"])) for r in P.pages(spark, 200).collect())
    assert a == b


def test_text_byte_identical_per_url_and_partitioning(spark):
    # the per-row invariant: text is a pure function of url (host); also must
    # not depend on partitioning
    df1 = P.pages(spark, 300, n_hosts=20, partitions=2)
    df2 = P.pages(spark, 300, n_hosts=20, partitions=13)
    t1 = {r["url"]: r["text"] for r in df1.collect()}
    t2 = {r["url"]: r["text"] for r in df2.collect()}
    assert t1 == t2
    # same host -> same geo payload in text
    host_geo = {}
    for url, text in t1.items():
        host = url.split("//")[1].split(".")[0]
        geo = text.split("geo_e6: ")[1].split(" ")[0]
        assert host_geo.setdefault(host, geo) == geo


def test_two_geocode_derivations_agree(spark):
    df = P.pages(spark, 500)
    from_text = P.extract_points(df)
    from_url = P.geocode_from_url(df)
    mismatch = (
        from_text.alias("a").join(from_url.alias("b"), on="url")
        .filter((F.col("a.lon") != F.col("b.lon")) | (F.col("a.lat") != F.col("b.lat")))
        .count()
    )
    assert mismatch == 0
    assert from_text.count() == 500


def test_skew_and_bounds(spark):
    pts = P.extract_points(P.pages(spark, 2000, n_hosts=500))
    rows = pts.collect()
    assert all(-180 <= r["lon"] <= 180 and -85.25 <= r["lat"] <= 85.25 for r in rows)
    # ~70% of hosts are clustered into 3 cities (skew for the join paths)
    near_city = pts.filter(
        (F.abs(F.col("lon") - (-73.985)) < 0.3) & (F.abs(F.col("lat") - 40.748) < 0.3)
        | (F.abs(F.col("lon") - 2.352) < 0.3) & (F.abs(F.col("lat") - 48.857) < 0.3)
        | (F.abs(F.col("lon") - 139.692) < 0.3) & (F.abs(F.col("lat") - 35.690) < 0.3)
    ).count()
    assert 0.55 * 2000 < near_city < 0.85 * 2000
