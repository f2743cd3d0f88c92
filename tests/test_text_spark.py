"""Training-data operators: dedup family, ANN, text analysis, streaming.
Python-oracle checks on small slices of the driver's documents table."""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def _tokens(text):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_exact_dedup(spark, docs):
    from osm_spark.text.dedup import exact_dedup

    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    d = exact_dedup(docs.unionByName(dup))
    rows = d.collect()
    assert sum(1 for r in rows if r.n_docs == 2) == 5
    # survivor is the min id (original)
    assert all(r.keep_id < 100000 for r in rows)


def test_minhash_jaccard_correlation(spark, docs):
    """MinHash signature agreement must approximate true Jaccard."""
    from osm_spark.text.dedup import minhash_signatures

    from osm_spark.text.dedup import MINHASH_K

    sigs = {r.doc_id: [r[f"mh{i}"] for i in range(MINHASH_K)] for r in
            minhash_signatures(docs.limit(60)).collect()}
    texts = {r.doc_id: set(_tokens(r.text)) for r in docs.limit(60).collect()}
    ids = sorted(sigs)
    err = []
    for i in range(0, 40, 5):
        for j in range(i + 1, 40, 7):
            a, b = ids[i], ids[j]
            true_j = len(texts[a] & texts[b]) / len(texts[a] | texts[b])
            est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / MINHASH_K
            err.append(abs(true_j - est))
    assert sum(err) / len(err) < 0.1  # 128 hashes -> tight estimate


def test_lsh_recall_on_near_duplicates(spark, docs):
    """Near-duplicates above the banding's design threshold must be
    caught; the corpus's template similarity must NOT explode the
    candidate set (the r1 failure: 35% of all pairs were candidates).

    Catch probability is 1-(1-j^rows)^bands: with 4×32 banding a
    one-token edit on a ~150-token doc (j≈0.993) is caught ≥99.9% of
    the time, while the corpus's median pairwise j=0.63 contributes
    essentially nothing (0.63^32 ≈ 4e-7)."""
    from osm_spark.text.dedup import exact_dedup, lsh_candidate_pairs, minhash_signatures

    # Realistic-length docs: 150 distinct tokens each, disjoint-ish.
    base = spark.range(20).selectExpr(
        "id AS doc_id",
        "array_join(transform(sequence(0, 149), "
        "  k -> concat('w', cast(id AS string), 'x', cast(k AS string))), ' ') AS text",
    )
    near = base.selectExpr(
        "doc_id + 100000 AS doc_id",
        # replace one token -> j = 149/151
        "concat(substring(text, 1, length(text) - 4), ' edited') AS text",
    )
    sigs = minhash_signatures(base.unionByName(near))
    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs).collect()
    }
    found = sum((d, d + 100000) in pairs for d in range(20))
    assert found >= 18

    # Exact duplicates are always caught (identical signatures).
    dup = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 200000)
    sigs2 = minhash_signatures(docs.limit(20).unionByName(dup))
    pairs2 = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs2).collect()
    }
    assert sum((d, d + 200000) in pairs2 for d in
               (r.doc_id for r in docs.limit(20).collect())) == 20

    # Selectivity on the template-similar corpus: < 5% of all pairs.
    n = docs.count()
    ratio = lsh_candidate_pairs(minhash_signatures(docs)).count() / (n * (n - 1) / 2)
    assert ratio < 0.05


def test_simhash_near_pairs(spark, docs):
    from osm_spark.text.dedup import simhash, simhash_near_pairs

    base = docs.limit(20)
    near = base.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzz"))
    )
    s = simhash(base.unionByName(near))
    by_id = {
        r.doc_id: r.sh0 | (r.sh1 << 16) | (r.sh2 << 32) | (r.sh3 << 48)
        for r in s.collect()
    }
    assert all(0 <= v < (1 << 64) for v in by_id.values())
    # Identical-ish docs have close simhashes. One added token on a
    # ~17-distinct-token doc flips ~6 of 64 bits (the unbiased
    # per-bit margin rate; the pre-r3 % M bit sources understated this
    # by zeroing bits 31/63 and Mersenne-folding the rest — ADVICE r2
    # #1) — far below the ~32-bit expectation for unrelated docs.
    dists = [bin(by_id[d] ^ by_id[d + 100000]).count("1") for d in range(20)]
    assert sum(h <= 12 for h in dists) >= 15, dists
    assert max(dists) <= 20, dists
    close = sum(h <= 3 for h in dists)
    pairs = simhash_near_pairs(s, max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # Pigeonhole guarantee: EVERY hamming<=3 pair shares a 16-bit word,
    # so the blocked join must find exactly the close pairs.
    assert sum((d, d + 100000) in got for d in range(20)) == close


def test_ngram_shingles(spark, docs):
    from osm_spark.text.dedup import ngram_shingles_sql

    row = docs.limit(1).select(
        "text", F.expr(ngram_shingles_sql("text", 3)).alias("sh")
    ).collect()[0]
    toks = _tokens(row.text)
    assert list(row.sh) == [
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    ]


def test_ngram_shingles_short_docs_yield_empty(spark):
    """Docs shorter than n tokens must give [] — Spark's sequence(1, 0)
    is descending [1, 0], and the unguarded form crashed slice() on the
    first 1-2-token document (regression)."""
    from osm_spark.text.dedup import ngram_shingles_sql

    df = spark.createDataFrame(
        [(1, "one two three"), (2, "two words"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: list(r.sh)
        for r in df.selectExpr(
            "doc_id", f"{ngram_shingles_sql('text', 3)} AS sh"
        ).collect()
    }
    assert got == {1: ["one two three"], 2: [], 3: [], 4: []}


def test_cosine_topk_vs_numpy(spark, emb):
    import numpy as np

    from osm_spark.text.ann import cosine_topk

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    queries = emb.where(F.col("vec_id") % 100 == 0)
    got = cosine_topk(emb, queries, k=5).collect()
    for qid in [r.vec_id for r in queries.collect()]:
        q = vecs[qid]
        sims = sorted(
            (
                (-float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), nid)
                for nid, v in vecs.items()
                if nid != qid
            ),
        )[:5]
        expected = [nid for _, nid in sims]
        mine = [r.neighbor_id for r in sorted(
            (r for r in got if r.query_id == qid), key=lambda r: r.rank)]
        assert mine == expected


def test_lsh_ann_recall(spark, emb):
    from osm_spark.text.ann import cosine_topk, hyperplane_lsh_topk

    queries = emb.where(F.col("vec_id") % 100 == 0)
    # The corpus is iid-random — LSH's worst case (no cluster
    # structure). q41's calibrated configuration (6 planes x 8 tables
    # x multiprobe-1, md5-derived hyperplanes) must clear the 0.8
    # mean-recall bound it asserts in the correctness gate.
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = hyperplane_lsh_topk(
        emb, queries, k=5, n_planes=6, n_tables=8, multiprobe_bits=1
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8


def test_ivf_ann_recall_determinism_and_selectivity(spark, emb):
    import numpy as np

    from osm_spark.text.ann import cosine_topk, ivf_topk, train_ivf_centroids

    # Quantizer training is bit-deterministic (md5-seeded init, fixed
    # Lloyd iterations) — the q45 oracle depends on this.
    c1 = train_ivf_centroids(emb, n_lists=16, n_iters=5)
    c2 = train_ivf_centroids(emb, n_lists=16, n_iters=5)
    assert np.array_equal(c1, c2)
    assert c1.shape[0] == 16
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk(
        emb, queries, k=5, n_lists=16, n_probe=8, centroids=c1
    ).collect()

    # Selectivity: candidates per query bounded well below brute force
    # (n_probe/n_lists = 1/2 of the corpus in expectation; allow skewed
    # lists some slack on the tiny test corpus).
    n = emb.count()
    assert max(r.n_candidates for r in approx) <= 0.8 * n

    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets
    ]
    # q45's calibrated bound on the iid worst-case corpus.
    assert sum(recalls) / len(recalls) >= 0.8


def test_langid_and_quality(spark, docs):
    from osm_spark.text.analysis import with_langid, with_quality_score

    out = with_langid(docs.limit(50)).collect()
    assert all(r.pred_lang in {"en", "fr", "de", "es", "it"} for r in out)
    q = with_quality_score(docs.limit(50)).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in q)


def test_fingerprint_whitespace_invariant(spark, docs):
    from osm_spark.text.analysis import with_fingerprint

    base = docs.limit(10)
    mangled = base.withColumn(
        "text", F.regexp_replace("text", " ", "   ")
    )
    f1 = {r.doc_id: r.fingerprint for r in with_fingerprint(base).collect()}
    f2 = {r.doc_id: r.fingerprint for r in with_fingerprint(mangled).collect()}
    assert f1 == f2


def test_streaming_windowed_counts(spark, tmp_path):
    """Structured Streaming path: file-stream the events parquet and
    compare windowed counts with the batch equivalent."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)
    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w.start, r.event_type): r.n
        for r in spark.table("win_counts").collect()
    }
    exp = {
        (r.w.start, r.event_type): r.n
        for r in events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_cosine_near_pairs_lsh_vs_exact(spark, emb):
    """The LSH-bucketed near-dup path: never a false positive (exact
    verify), and near-CERTAIN recall in its design regime — true
    near-duplicates (sim ≈ 1), where per-table bucket collision is
    (1 - θ/π)^planes ≈ 0.95. (At sim ~0.3 on iid-random vectors pair
    recall is physics-bound to ~0.35 with any selective bucketing —
    that regime belongs to exact mode, q42's oracle.)"""
    from osm_spark.text.ann import cosine_near_pairs

    base = emb.select("vec_id", "embedding").limit(20)
    near = base.selectExpr(
        "vec_id + 100000 AS vec_id",
        # tiny deterministic perturbation of one component: sim ≈ 0.999+
        "transform(embedding, (x, i) -> CASE WHEN i = 0 "
        "THEN cast(x + 0.01 AS float) ELSE x END) AS embedding",
    )
    both = base.unionByName(near)
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_near_pairs(both, 0.99, mode="exact").collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in cosine_near_pairs(both, 0.99, mode="lsh").collect()
    }
    assert lsh <= exact  # exact verify removes every false positive
    planted = {
        (r.vec_id, r.vec_id + 100000) for r in base.select("vec_id").collect()
    }
    assert planted <= exact
    assert len(lsh & planted) >= 18  # near-dup recall in-design-regime


def test_hash_split_deterministic_and_exhaustive(spark, docs):
    """Content-hash splits: every row gets exactly one split, the
    assignment is a pure function of the key (identical across runs
    and partitionings), proportions track the weights, and the bucket
    arithmetic matches an independent hashlib computation."""
    import hashlib

    from osm_spark.text.sampling import hash_bucket, hash_sample, hash_split

    keyed = docs.select("doc_id", F.col("doc_id").cast("string").alias("k"))
    splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r.doc_id: r.split for r in hash_split(keyed, "k", splits, salt="v1:").collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(keyed.repartition(7), "k", splits, salt="v1:").collect()
    }
    assert a == b  # partitioning-independent
    assert set(a.values()) <= {"train", "val", "test"}
    n = len(a)
    assert n == docs.count()  # exhaustive, no row dropped
    train_frac = sum(1 for v in a.values() if v == "train") / n
    assert 0.8 < train_frac < 0.97
    # independent python oracle for the bucket arithmetic
    some = next(iter(a))
    expect = int(hashlib.md5(f"v1:{some}".encode()).hexdigest()[:12], 16) % 10_000
    got = spark.createDataFrame([(str(some),)], "k string").select(
        hash_bucket(F.col("k"), 10_000, "v1:").alias("b")
    ).first()["b"]
    assert got == expect
    # hash_sample(rate=0.9) keeps exactly the train split (same prefix)
    kept = {r.doc_id for r in hash_sample(keyed, "k", 0.9, salt="v1:").collect()}
    assert kept == {k for k, v in a.items() if v == "train"}


# --- stratified_sample (text/sampling.py) -------------------------------


def _strat_expected(rows, cap, salt=""):
    import hashlib
    from collections import defaultdict

    by_g = defaultdict(list)
    for k, g in rows:
        h = int(hashlib.md5((salt + str(k)).encode()).hexdigest()[:12], 16)
        by_g[g].append((h, k))
    out = set()
    for g, hs in by_g.items():
        c = cap[g] if isinstance(cap, dict) else cap
        for _, k in sorted(hs)[:c]:
            out.add((k, g))
    return out


def test_stratified_sample_exact_cap_smallest_hashes(spark):
    from osm_spark.text.sampling import stratified_sample

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(200)] + [
        (1000 + i, "rare") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "k long, g string")
    got = {
        (r["k"], r["g"])
        for r in stratified_sample(df, "k", "g", cap=10).collect()
    }
    assert got == _strat_expected(rows, 10)
    # rare group has only 3 rows < cap → all kept
    assert sum(1 for _, g in got if g == "rare") == 3


def test_stratified_sample_dict_caps_and_missing_group_drops(spark):
    from osm_spark.text.sampling import stratified_sample

    rows = [(i, ["en", "fr", "zz"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "k long, g string")
    caps = {"en": 5, "fr": 2}
    got = {
        (r["k"], r["g"])
        for r in stratified_sample(df, "k", "g", cap=caps).collect()
    }
    assert got == _strat_expected([r for r in rows if r[1] in caps], caps)
    assert not any(g == "zz" for _, g in got)


def test_stratified_sample_patch_path_still_exact(spark):
    from osm_spark.text.sampling import stratified_sample

    # margin so small the prefilter keeps ~nothing: the under-selection
    # check must fire and the patch re-run must restore exactness
    rows = [(i, "en") for i in range(500)]
    df = spark.createDataFrame(rows, "k long, g string")
    got = {
        (r["k"], r["g"])
        for r in stratified_sample(df, "k", "g", cap=7, margin=1e-9).collect()
    }
    assert got == _strat_expected(rows, 7)


def test_stratified_sample_partitioning_invariant(spark):
    from osm_spark.text.sampling import stratified_sample

    rows = [(i, ["a", "b"][i % 2]) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, g string")
    a = {(r["k"], r["g"]) for r in stratified_sample(df, "k", "g", 8).collect()}
    b = {
        (r["k"], r["g"])
        for r in stratified_sample(df.repartition(17), "k", "g", 8).collect()
    }
    assert a == b
