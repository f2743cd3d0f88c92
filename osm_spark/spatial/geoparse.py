"""Geoparsing: extract coordinate mentions from page text (JVM-side).

Pages embed coordinates as integer micro-degrees ("geo: <lat>,<lon>"),
extracted with regexp_extract — pure Catalyst, no Python on the 10^12-row
path. The page ``text`` column is passed through UNTOUCHED: the engine's
per-row invariant is byte-identical text per url end-to-end
(BASELINE.json input_hint); every derived quantity is a new column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEO_RE = r"geo: (-?\d+),(-?\d+)"


def geoparse_pages(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, lang, text, lat, lon) — rows without a coordinate
    mention are dropped (no geo signal). lat/lon in degrees (double)."""
    lat_s = F.regexp_extract("text", GEO_RE, 1)
    lon_s = F.regexp_extract("text", GEO_RE, 2)
    return (
        pages.withColumn("lat_u", F.nullif(lat_s, F.lit("")).cast("long"))
        .withColumn("lon_u", F.nullif(lon_s, F.lit("")).cast("long"))
        .where(F.col("lat_u").isNotNull() & F.col("lon_u").isNotNull())
        .withColumn("lat", F.col("lat_u") / 1e6)
        .withColumn("lon", F.col("lon_u") / 1e6)
        .drop("lat_u", "lon_u")
    )
