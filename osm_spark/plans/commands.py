"""§2.8 CLI-command surface — the reference's diagnostics as thin
DataFrame compositions (main.go:525-647, 711-725).

The heavy commands (count/indexways/indexrelations/indexlocations/
indexcenters/geojson/check) live in plans.pipeline + operators; these
are the remaining diagnostic verbs, wrapped so a reference user can run
every command they run today:

- printnodes      (main.go:525-563): node id + "%f"-formatted coords
- printxmlnodes   (main.go:565-606): same from XML text lines
- recursiverel    (main.go:608-647): kept relations built from other
                  relations, with the rel.String() diagnostic name
- resetdb         (main.go:711-725): drop one checkpoint table
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.config import EngineConfig


def printnodes(nodes: DataFrame) -> DataFrame:
    """(id, lat, lon) with Go's formatCoord rendering (fmt %f — six
    fixed decimals; java.util.Formatter's %f matches). Scan order =
    id order (o5m files are id-sorted; so is the nodes table)."""
    return nodes.orderBy("id").select(
        "id",
        F.format_string("%f", F.col("lat") / 1e7).alias("lat"),
        F.format_string("%f", F.col("lon") / 1e7).alias("lon"),
    )


XML_NODE_RE = r'^\s*<node\s+id="([^"]+)"\s+lat="([^"]+)"\s+lon="([^"]+)"'


def printxmlnodes(lines: DataFrame, col: str = "line") -> DataFrame:
    """(id, lat, lon) extracted from XML text lines (S4 scan analog —
    regexp over a text table instead of a file scanner)."""
    c = F.col(col)
    m = F.regexp_extract(c, XML_NODE_RE, 1)
    return (
        lines.where(m != "")
        .select(
            F.regexp_extract(c, XML_NODE_RE, 1).cast("long").alias("id"),
            F.regexp_extract(c, XML_NODE_RE, 2).alias("lat"),
            F.regexp_extract(c, XML_NODE_RE, 3).alias("lon"),
        )
    )


def recursiverel(relations: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Kept relations composed of other relations (main.go:614-647):
    ignoreRelation filter, then count way members and outer/inner
    relation members; keep rows with >= 1 such relation member.
    Output (rel_str, n_ways) where rel_str is rel.String() —
    "Name(id)[level=x]" with the Relation.Name() name:* fallback."""
    from osm_spark.operators.filters import split_kept_relations

    kept, _errors = split_kept_relations(relations, cfg)
    n_ways = F.size(F.expr("filter(refs, r -> r.ref_type = 1)"))
    n_rels = F.size(
        F.expr(
            "filter(refs, r -> r.ref_type = 2 AND r.role IN ('outer', 'inner'))"
        )
    )
    rel_str = F.concat(
        F.col("name_diag"), F.lit("("), F.col("id").cast("string"),
        F.lit(")[level="), F.col("admin_level_raw"), F.lit("]"),
    )
    return (
        kept.withColumn("n_ways", n_ways)
        .withColumn("n_rels", n_rels)
        .where(F.col("n_rels") > 0)
        .select(rel_str.alias("rel_str"), "n_ways")
    )


def resetdb(checkpoint_dir: str, bucket: str) -> bool:
    """Drop one checkpoint table (DeleteBucket analog). Returns whether
    the table existed. Valid buckets mirror the reference's waysdb
    buckets: ways_geom / locations / centroids / boundaries / metrics."""
    path = os.path.join(checkpoint_dir, bucket)
    if not os.path.isdir(path):
        return False
    shutil.rmtree(path)
    return True
