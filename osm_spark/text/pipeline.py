"""End-to-end training-data curation pipeline.

Composes the engine's text operators into the standard web-corpus
curation sequence, with every document accounted for:

    repetition filter → exact dedup → decontamination →
    source mixing → train/val/test split

Each stage consumes the SURVIVORS of the previous one — order
matters and is part of the contract (mix rates are computed over the
deduped, decontaminated corpus; deduping after mixing would re-skew
the mixture). The output is one row per input document with its final
``disposition``: the drop reason at the first failing stage, or the
split name if it survived everything.

Scale notes: the pipeline adds NO shuffles beyond its constituent
operators (each documented in SCALE.md); the stage chaining is
semi-joins on the key, which Catalyst folds into the stage plans.
The two driver-side steps stay O(sources) (mix rates) and O(1)
(share totals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DROP_REPETITION = "drop_repetition"
DROP_EXACT_DUP = "drop_exact_dup"
DROP_CONTAMINATED = "drop_contaminated"
DROP_MIX = "drop_mix"


def curate(
    docs: DataFrame,
    bench: DataFrame,
    shares: dict[str, int],
    token_budget: int,
    splits: dict[str, float],
    key: str = "doc_id",
    text: str = "text",
    source: str = "source",
    ngram_n: int = 8,
    salt: str = "v1:",
) -> DataFrame:
    """Per-document final disposition of the full curation pipeline.

    Returns (key, disposition). Dispositions are the DROP_* constants
    or a split name from ``splits``; every input doc appears exactly
    once (documents with zero tokens fall under DROP_REPETITION —
    nothing to assess, nothing to train on).
    """
    from osm_spark.text.decontaminate import contamination
    from osm_spark.text.repetition import with_repetition_stats
    from osm_spark.text.sampling import hash_split, mix_sample

    keyc = F.col(key)

    # Stage outputs are lineage-truncated (localCheckpoint): the final
    # result UNIONs one branch per stage, and without truncation every
    # branch re-derives the whole upstream cascade (plans grow
    # multiplicatively, like the components rounds — see SCALE.md).
    # On a real cluster each stage boundary is a materialized table
    # version (ManifestTable append) instead.
    def _cut(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    # stage 1: repetition / emptiness
    rep = with_repetition_stats(docs, text=text, key=key).select(
        key, "keep_repetition"
    )
    tagged = _cut(
        docs.join(rep, key, "left").withColumn(
            "keep_repetition", F.coalesce("keep_repetition", F.lit(False))
        )
    )
    drop1 = tagged.where(~F.col("keep_repetition")).select(
        keyc, F.lit(DROP_REPETITION).alias("disposition")
    )
    s1 = tagged.where(F.col("keep_repetition")).drop("keep_repetition")

    # stage 2: exact dedup (smallest key per content hash wins)
    rn = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text))).orderBy(key)
    )
    ranked = _cut(s1.withColumn("rn", rn))
    drop2 = ranked.where(F.col("rn") > 1).select(
        keyc, F.lit(DROP_EXACT_DUP).alias("disposition")
    )
    s2 = ranked.where(F.col("rn") == 1).drop("rn")

    # stage 3: decontamination against the eval set
    cont = contamination(s2, bench, n=ngram_n, text=text, key=key).select(
        key, "contaminated"
    )
    s2c = _cut(s2.join(cont, key))
    drop3 = s2c.where(F.col("contaminated")).select(
        keyc, F.lit(DROP_CONTAMINATED).alias("disposition")
    )
    s3 = s2c.where(~F.col("contaminated")).drop("contaminated")

    # stage 4: source mixing to the token budget
    mixed = mix_sample(
        s3, shares, token_budget, key=key, text=text, source=source
    ).select(key, "keep")
    s3m = _cut(s3.join(mixed, key))
    drop4 = s3m.where(~F.col("keep")).select(
        keyc, F.lit(DROP_MIX).alias("disposition")
    )
    s4 = s3m.where(F.col("keep")).drop("keep")

    # stage 5: split assignment for the survivors
    final = hash_split(
        s4.withColumn("_k", keyc.cast("string")), "_k", splits, salt=salt
    ).select(keyc, F.col("split").alias("disposition"))

    return drop1.unionByName(drop2).unionByName(drop3).unionByName(
        drop4
    ).unionByName(final)
