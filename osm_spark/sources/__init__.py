from osm_spark.sources.manifest_table import CommitConflict, ManifestTable

__all__ = ["CommitConflict", "ManifestTable"]
