"""BPE tokenizer training + encoding (text/bpe.py) vs an independent
pure-python classic-BPE twin (Sennrich get_stats + greedy merge)."""

import re

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Independent twin: classic BPE, written against the paper, not bpe.py.
# --------------------------------------------------------------------------

def _twin_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _twin_merge_word(s, l, r):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _twin_train(word_freq, k):
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(1, k + 1):
        stats = {}
        for w, f in word_freq.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] = stats.get((s[i], s[i + 1]), 0) + f
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((rank, l, r, c))
        for w in vocab:
            vocab[w] = _twin_merge_word(vocab[w], l, r)
    return merges, vocab


CORPUS = [
    (1, "the lower the newer the wider"),
    (2, "lower and lowest and newest"),
    (3, "aaa abab aaaa the the"),
    (4, "newer lower wider lowest"),
    (5, "the newest abab aaa"),
    (6, ""),
    (7, "zzz"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id: int, text: string")


def _twin_word_freq():
    wf = {}
    for _, t in CORPUS:
        for w in _twin_tokens(t):
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_merge_fold_greedy_runs(spark):
    from osm_spark.text.bpe import merge_fold

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["l", "o", "w"],),
         (["a", "b", "a", "b"],)],
        "syms: array<string>",
    )
    got = [r[0] for r in df.select(merge_fold(F.col("syms"), "a", "a")).collect()]
    assert got == [["aa", "aa"], ["aa", "a"], ["l", "o", "w"], ["a", "b", "a", "b"]]
    got2 = [r[0] for r in df.select(merge_fold(F.col("syms"), "a", "b")).collect()]
    assert got2[3] == ["ab", "ab"]


def test_train_matches_twin(spark, docs):
    from osm_spark.text.bpe import bpe_train

    k = 8
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, n_merges=k).orderBy("merge_rank").collect()
    ]
    want, _ = _twin_train(_twin_word_freq(), k)
    assert got == want
    assert len(got) > 0


def test_train_partition_invariance(spark, docs):
    from osm_spark.text.bpe import bpe_train

    a = bpe_train(docs.repartition(7), n_merges=5).collect()
    b = bpe_train(docs.coalesce(1), n_merges=5).collect()
    assert sorted(a) == sorted(b)


def test_encode_matches_twin_vocab(spark, docs):
    from osm_spark.text.bpe import bpe_train, bpe_encode

    merges = bpe_train(docs, n_merges=8)
    twin_merges, twin_vocab = _twin_train(_twin_word_freq(), 8)
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["bpe_text"])
        for r in bpe_encode(docs, merges).collect()
    }
    assert set(out) == {d for d, _ in CORPUS}  # no silent row loss
    for doc_id, text in CORPUS:
        words = _twin_tokens(text)
        pieces = [p for w in words for p in twin_vocab.get(w, list(w))]
        assert out[doc_id] == (len(words), len(pieces), " ".join(pieces))


def test_encode_conserves_bytes(spark, docs):
    from osm_spark.text.bpe import bpe_train, bpe_encode

    merges = bpe_train(docs, n_merges=6)
    from osm_spark.text.analysis import tokens_col

    joined = bpe_encode(docs, merges).join(
        docs.select("doc_id", F.array_join(tokens_col("text"), "").alias("raw")),
        "doc_id",
    )
    bad = joined.where(
        F.replace(F.col("bpe_text"), F.lit(" "), F.lit("")) != F.col("raw")
    ).count()
    assert bad == 0


def test_encode_modes_identical(spark, docs):
    from osm_spark.text.bpe import bpe_train, bpe_encode

    merges = bpe_train(docs, n_merges=6)
    direct = {tuple(r) for r in bpe_encode(docs, merges, mode="direct").collect()}
    dict_ = {tuple(r) for r in bpe_encode(docs, merges, mode="dict").collect()}
    assert direct == dict_


def _rich_corpus(n_docs=250):
    """Synthetic corpus with enough pair structure for 256+ productive
    merges: 3-syllable words over a 24-syllable alphabet, Zipf-ish
    repetition so pair counts stay >= 2 deep into training."""
    import hashlib

    sylls = [
        "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
        "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "yu",
        "za", "bri", "sto", "plan",
    ]
    docs = []
    for d in range(n_docs):
        words = []
        for i in range(40):
            h = int(
                hashlib.md5(f"bpek-{d}-{i}".encode()).hexdigest()[:8], 16
            )
            # Zipf-ish: low word ids repeat often across the corpus
            wid = h % (1 + (h >> 8) % 4000)
            a = sylls[wid % 24]
            b = sylls[(wid // 24) % 24]
            c = sylls[(wid // 576) % 24]
            words.append(a + b + c)
        docs.append((d, " ".join(words)))
    return docs


def test_train_and_encode_at_production_merge_count(spark):
    """K=256 (VERDICT r4 next #7): the affected-only incremental pair
    counts must equal the twin's full per-round recounts for ALL 256
    rounds (one drifted count would flip some later argmax), training
    lineage stays bounded via checkpoint_every, and the CHUNKED dict
    encode (chunk_size=32 → 8 staged projections) matches the twin's
    greedy vocab."""
    from osm_spark.text.bpe import bpe_encode, bpe_train

    corpus = _rich_corpus()
    docs = spark.createDataFrame(corpus, "doc_id: int, text: string")
    k = 256
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, n_merges=k, checkpoint_every=16)
        .orderBy("merge_rank")
        .collect()
    ]
    wf = {}
    for _, t in corpus:
        for w in _twin_tokens(t):
            wf[w] = wf.get(w, 0) + 1
    want, twin_vocab = _twin_train(wf, k)
    assert got == want
    assert len(got) >= 256  # the corpus really sustains K=256

    out = {
        r["doc_id"]: r["bpe_text"]
        for r in bpe_encode(
            docs, [(l, r) for _, l, r, _ in got], chunk_size=32
        ).collect()
    }
    for doc_id, text in corpus[:25]:
        words = _twin_tokens(text)
        pieces = [p for w in words for p in twin_vocab.get(w, list(w))]
        assert out[doc_id] == " ".join(pieces), doc_id


def test_chunked_kernel_equals_catalyst_dictionary(spark, docs):
    """The Arrow-batched dictionary kernel (production-K path) must be
    bit-identical to the Catalyst fold path on the same merges —
    forced here by shrinking chunk_size below the merge count."""
    from osm_spark.text.bpe import bpe_train, bpe_encode

    merges = bpe_train(docs, n_merges=6)
    catalyst = {
        tuple(r) for r in bpe_encode(docs, merges, chunk_size=64).collect()
    }
    kernel = {
        tuple(r) for r in bpe_encode(docs, merges, chunk_size=2).collect()
    }
    assert catalyst == kernel
