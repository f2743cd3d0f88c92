"""Incremental spatial enrichment over manifest-table appends.

The production loop a Common-Crawl-scale pipeline actually runs: the
pages table grows by snapshot appends (a new crawl lands as one
ManifestTable ``append`` commit), and the PIP assignment table must
follow WITHOUT re-scanning the 10^12 rows already assigned. This
module is the spatial counterpart of text/dedup.dedup_increment
(X43's incremental cross-snapshot dedup):

    new rows = pages.changes(last_applied, current)   — a manifest
        FILE-diff first, so only the appended files are ever read;
    assignments = geoparse → broadcast-index PIP (the X3 zero-shuffle
        path) over just those rows;
    commit = ONE ManifestTable append of (assignments + a marker row
        recording the applied source version) — atomic via the VERSION
        swap, so the marker and its rows commit together or not at
        all, and a crash-retry re-run is a no-op (the marker says the
        source version is already applied).

Markers: url = "" (page urls are never empty), rel_id = applied
source version; the latest applied version is max(rel_id) over marker
rows (markers accumulate one per increment — metadata-scale).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_MARKER_URL = ""


def applied_source_version(out) -> int | None:
    """Last pages-table version applied to the assignment table."""
    if not out.exists():
        return None
    row = (
        out.read()
        .where(F.col("url") == _MARKER_URL)
        .agg(F.max("rel_id").alias("v"))
        .first()
    )
    return None if row is None or row["v"] is None else int(row["v"])


def pip_increment(
    spark: SparkSession,
    pages_table,
    assign_path: str,
    index_bc,
) -> dict:
    """Bring the durable (url, rel_id) assignment table at
    ``assign_path`` up to date with the append-only ``pages_table``
    (a ManifestTable of the input_hint page schema). Returns
    {"applied_from", "applied_to", "total_rows"} (total assignment
    rows AFTER the commit — one cheap post-commit count); a no-op
    re-run leaves the table untouched (applied_from == applied_to).
    """
    from osm_spark.sources.manifest_table import ManifestTable
    from osm_spark.spatial.geoparse import geoparse_pages
    from osm_spark.spatial.pip_index import pip_join_index

    cur = pages_table.current_version()
    if cur is None:
        raise ValueError("pages table has no committed snapshot")
    out = ManifestTable(spark, assign_path)
    applied = applied_source_version(out)
    if applied is not None and applied >= cur:
        return {
            "applied_from": applied,
            "applied_to": applied,
            "total_rows": None,
        }

    if applied is None:
        fresh = pages_table.read()
    else:
        ch = pages_table.changes(applied, cur)
        deletes = ch.where(F.col("_change_type") == "delete")
        # append-only contract: a delete in the diff means the source
        # was rewritten under us — incremental append would be wrong
        if deletes.limit(1).count():
            raise ValueError(
                "pages table saw deletes/rewrites between versions "
                f"{applied}..{cur}; rebuild the assignment table"
            )
        fresh = ch.where(F.col("_change_type") == "insert").drop(
            "_change_type"
        )

    pts = geoparse_pages(fresh).withColumn(
        "point_id", F.xxhash64("url")
    )
    assigns = pip_join_index(
        pts.select("point_id", "lon", "lat", "url"), index_bc, keep=("url",)
    ).select("url", F.col("rel_id").cast("long"))
    marker = spark.createDataFrame(
        [(_MARKER_URL, cur)], "url string, rel_id long"
    )
    out.write(
        assigns.unionByName(marker),
        mode="append" if out.exists() else "overwrite",
    )
    n = (
        out.read()
        .where(F.col("url") != _MARKER_URL)
        .count()
    )
    return {"applied_from": applied, "applied_to": cur, "total_rows": n}
