"""Deterministic Common-Crawl-style pages table + derived point layer.

Input shape per BASELINE.json input_hint:
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Everything is generated from ``spark.range`` with pure column expressions —
fully distributed, seed-free deterministic (xxhash64 with a fixed seed), so
the same (url → text → coordinates) mapping holds at any scale and any
partitioning. ``text`` is a pure function of the url host, which makes the
per-row invariant "byte-identical extracted text per url" hold by
construction and testable.

Geocoding: integer microdegrees derived from xxhash64(host). 70% of hosts
land in 3 dense "city" clusters, 30% spread uniformly — deliberately skewed
to exercise the salted/broadcast spatial-join paths (FIXTURES.md §1).
Latitude is clamped to [-85, 85]: the Web-Mercator domain edge at
±85.05112878 is where JVM/C libm differ by an ulp (see tests/test_tiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
LANGS = ["en", "de", "fr", "es", "pt"]
# (lon, lat) microdegree centers of the three skew clusters ("cities")
CITIES = [(-73_985_000, 40_748_000), (2_352_000, 48_857_000), (139_692_000, 35_690_000)]
CITY_SPREAD_E6 = 250_000  # ±0.25 degrees around a city center
SKEW_PCT = 70  # % of hosts in cities


def _hash_pos(col, lo: int, hi: int, salt: str):
    """Deterministic integer in [lo, hi) from a column (xxhash64, seed 42)."""
    span = hi - lo
    return (F.pmod(F.xxhash64(col, F.lit(salt), F.lit(SEED)), F.lit(span)) + F.lit(lo)).cast("long")


def geo_micro_cols(host):
    """(lon_e6, lat_e6) integer-microdegree columns as a pure function of the
    host column — the hash geocoder. Same formula is re-applied on read to
    verify 'two derivations agree' (FIXTURES.md §1)."""
    pick = F.pmod(F.xxhash64(host, F.lit("pick"), F.lit(SEED)), F.lit(100))
    city = F.pmod(F.xxhash64(host, F.lit("city"), F.lit(SEED)), F.lit(len(CITIES)))
    city_lon = F.element_at(F.array(*[F.lit(c[0]) for c in CITIES]), city.cast("int") + 1)
    city_lat = F.element_at(F.array(*[F.lit(c[1]) for c in CITIES]), city.cast("int") + 1)
    jlon = _hash_pos(host, -CITY_SPREAD_E6, CITY_SPREAD_E6, "jlon")
    jlat = _hash_pos(host, -CITY_SPREAD_E6, CITY_SPREAD_E6, "jlat")
    ulon = _hash_pos(host, -179_500_000, 179_500_000, "ulon")
    ulat = _hash_pos(host, -85_000_000, 85_000_000, "ulat")
    lon_e6 = F.when(pick < SKEW_PCT, city_lon + jlon).otherwise(ulon)
    lat_e6 = F.when(pick < SKEW_PCT, city_lat + jlat).otherwise(ulat)
    return lon_e6.cast("long"), lat_e6.cast("long")


def pages(spark: SparkSession, n_rows: int, n_hosts: int | None = None,
          partitions: int | None = None) -> DataFrame:
    """Generate the pages table. n_hosts defaults to n_rows // 4 (several
    pages per host, so the per-url text invariant is exercised)."""
    if n_hosts is None:
        n_hosts = max(1, n_rows // 4)
    rng = spark.range(0, n_rows, 1, numPartitions=partitions) if partitions else spark.range(n_rows)
    df = rng.withColumn("host", F.format_string("h%06d", (F.col("id") % n_hosts).cast("int")))
    lon_e6, lat_e6 = geo_micro_cols(F.col("host"))
    df = (
        df.withColumn("lon_e6", lon_e6)
        .withColumn("lat_e6", lat_e6)
        .withColumn("url", F.format_string("https://%s.example/p/%d", F.col("host"), F.col("id")))
        .withColumn("warc_ts",
                    F.timestamp_seconds(F.lit(1767225600) + F.col("id")))  # 2026-01-01 + id sec
        .withColumn("lang",
                    F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                                 (F.col("id") % len(LANGS)).cast("int") + 1))
        .withColumn(
            "text",
            F.format_string(
                "site %s crawl page geo_e6: %d,%d lang tail words alpha beta gamma",
                F.col("host"), F.col("lon_e6"), F.col("lat_e6"),
            ),
        )
        .withColumn(
            "html",
            F.encode(
                F.format_string("<html><head><title>%s</title></head><body><p>%s</p></body></html>",
                                F.col("host"), F.col("text")),
                "UTF-8",
            ),
        )
    )
    return df.select("url", "warc_ts", "html", "text", "lang")


def extract_points(pages_df: DataFrame, extra=()) -> DataFrame:
    """Derive the point layer (url, lon, lat) from ``text`` — the engine-side
    extraction. Pure column regexp, no UDF. lon/lat are exact: integer
    microdegrees / 1e6 computed identically to the generator.
    ``extra``: additional columns to carry in the same projection (e.g. a
    text hash for a downstream dedup stage — avoids a second scan/join).

    One regex pass extracts the "lon,lat" payload, a split finishes the
    parse — halves the per-row string scanning vs two regexp_extract calls
    (measurable at 10^8 rows)."""
    pair = F.regexp_extract("text", r"geo_e6: (-?\d+,-?\d+)", 1)
    parts = F.split(pair, ",")
    return pages_df.select(
        "url",
        (parts.getItem(0).cast("long") / 1e6).alias("lon"),
        (parts.getItem(1).cast("long") / 1e6).alias("lat"),
        *extra,
    )


def geocode_from_url(pages_df: DataFrame) -> DataFrame:
    """Second derivation: hash-geocode the url host directly (must agree with
    extract_points — FIXTURES.md §1 'two derivations that must agree')."""
    host = F.regexp_extract("url", r"https://([^.]+)\.example/", 1)
    lon_e6, lat_e6 = geo_micro_cols(host)
    return pages_df.select(
        "url",
        (lon_e6 / 1e6).alias("lon"),
        (lat_e6 / 1e6).alias("lat"),
    )
