"""Product quantization (IVF-PQ) ANN — exact-integer, memory-compressed.

The third leg of the ANN stool (ann.py: exact brute / hyperplane LSH /
IVF): at 10^12 vectors the binding resource is no longer candidate
COUNT but candidate BYTES — a 64-dim float corpus is 256 B/row, so
even a selective IVF probe streams TBs of vectors per query batch.
FAISS's answer is IVF-PQ: quantize each vector into ``m_sub`` small
codes (here 4×16 codes = 4 B/row, a 64× reduction at dim=64/float32)
and rank candidates by Asymmetric Distance Computation (ADC) — a
per-query lookup table of subspace distances, summed by code — then
exact-re-rank only the short ADC head. The corpus the join streams is
the CODES table, not the vectors.

House exactness convention (kmeans.py): every distance is int64 over
micro-unit quantized coordinates (``round(x·10^6)`` — half away from
zero on Spark, DuckDB and numpy alike), so encode, ADC and the refine
re-rank are bit-identical across engines, partitionings and cluster
sizes — the q146 oracle recomputes assignment → codes → probes → LUT
→ ADC ranking → refine → recall entirely in SQL from codebook
literals.

Training (``pq_fit``) follows the IVF precedent (ann.py): a
deterministic ``id % sample_mod`` sample collected to the driver and
fitted by a pure-numpy integer Lloyd that is BIT-IDENTICAL, subspace
by subspace, to the distributed ``kmeans.kmeans_fit`` on the sliced
frame (pinned by test_pq) — and kmeans_fit itself is pinned against a
full SQL replay (q134). Chain: q134 pins the trainer, test_pq pins
the np twin, q146 pins encode+search. At 10^12 rows pick sample_mod
so the sample stays ~10^5-10^6 rows (PQ codebook quality saturates
far below that — FAISS trains on samples as standard practice).

Scale shape of ``pq_adc_topk``:
- corpus pass: ONE zero-shuffle projection computing (list_id, codes)
  — catalyst folds for small ksub, an Arrow int64 GEMM (bit-identical,
  batch-local) for wide ksub·m_sub. Encode once, reuse across query
  batches (the codes table is the persisted artifact).
- query side: probes + the m_sub×ksub LUT are per-QUERY columns (tiny).
- candidate join: list_id equi-join (same selectivity lever as IVF:
  ≈ n_probe/n_lists of the corpus), ADC = one zip_with/aggregate over
  m_sub ints per candidate — no vector bytes move.
- refine: exact int64 d2 on the top-``refine`` ADC rows only.

Variant note: both FAISS encodings are implemented. The default
(``by_residual=False``) encodes raw vectors — one code table serves
every probe list, the simplest distributed artifact. With
``by_residual=True`` (FAISS's IVF-PQ default) each vector is encoded
as its RESIDUAL against its assigned coarse centroid and the search
LUT is built per (query, probe-list) pair from the query's residual
against THAT list's centroid: ||q − (c_l + code)||² =
||(q − c_l) − code||². On clustered corpora the residuals span the
within-cluster spread only, so the same code budget resolves far
finer distances — ADC stops mis-ranking within clusters and the
exact-refine head shrinks (VERDICT r4 #3; measured in BENCH.md's
pq_scale leg). Everything stays exact int64, so the q162 oracle
re-derives the full residual pipeline relationally.

No reference counterpart (pmezard/osm has no vector search); this is
the training-data extension surface (SURVEY §2.9) — near-dup mining /
similarity search over page embeddings at compression ratios the raw
corpus cannot reach.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.text.kmeans import (
    DEFAULT_SCALE,
    _trunc_div,
    assign_expr,
    quantize_vectors,
)


def quantize_np(X: np.ndarray, scale: int = DEFAULT_SCALE) -> np.ndarray:
    """int64 micro-unit quantization — numpy twin of
    ``kmeans.quantize_vectors`` (round half AWAY FROM ZERO, matching
    Spark HALF_UP and DuckDB round; np.round would bank-round)."""
    Xs = np.asarray(X, dtype=np.float64) * float(scale)
    return np.where(
        Xs >= 0.0, np.floor(Xs + 0.5), np.ceil(Xs - 0.5)
    ).astype(np.int64)


def _lloyd_int_np(
    ids: np.ndarray, Q: np.ndarray, k: int, n_iters: int
) -> np.ndarray:
    """Integer Lloyd over int64 rows — bit-identical to
    ``kmeans.kmeans_fit`` on the same rows (same seed rule
    md5('km-'||id) with id tiebreak, same lowest-cid argmin ties, same
    truncating division, same empty-cluster-keeps-previous)."""
    order = np.lexsort(
        (
            ids,
            np.asarray(
                [hashlib.md5(f"km-{int(i)}".encode()).hexdigest() for i in ids]
            ),
        )
    )
    if k > len(ids):
        raise ValueError(f"k={k} exceeds sample size {len(ids)}")
    C = Q[order[:k]].copy()
    for _ in range(n_iters):
        # d2 via the int64 GEMM identity (kmeans._round_sums_numpy):
        # |q|^2 - 2 q.C^T + |c|^2, every operand int64 → exact.
        G = Q @ C.T
        D = (Q * Q).sum(axis=1)[:, None] - 2 * G + (C * C).sum(axis=1)[None, :]
        cid = np.argmin(D, axis=1)  # first-min = lowest cid, as array_min
        for j in range(k):
            sel = Q[cid == j]
            if len(sel):
                s = sel.sum(axis=0, dtype=np.int64)
                n = len(sel)
                C[j] = np.array(
                    [_trunc_div(int(v), n) for v in s], dtype=np.int64
                )
    return C


def train_pq_q(
    ids: np.ndarray, Q: np.ndarray, m_sub: int, ksub: int, n_iters: int = 3
) -> np.ndarray:
    """(m_sub, ksub, dsub) int64 codebooks from ALREADY-QUANTIZED int64
    rows — per-subspace integer Lloyd. Pure function of the row SET
    (rows id-sorted first); every subspace uses the same seed ROWS
    (the md5 rule ranks ids, not coordinates), exactly what
    ``kmeans_fit`` on the sliced frame computes. Residual training
    enters here: pass residual rows, same trainer."""
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    Q = np.asarray(Q, dtype=np.int64)[order]
    dim = Q.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    return np.stack(
        [
            _lloyd_int_np(ids, Q[:, s * dsub : (s + 1) * dsub], ksub, n_iters)
            for s in range(m_sub)
        ]
    )


def train_pq_np(
    ids: np.ndarray,
    X: np.ndarray,
    m_sub: int,
    ksub: int,
    n_iters: int = 3,
    scale: int = DEFAULT_SCALE,
) -> np.ndarray:
    """(m_sub, ksub, dsub) int64 codebooks over quantized float rows —
    ``train_pq_q`` after micro-unit quantization."""
    return train_pq_q(
        ids, quantize_np(np.asarray(X, dtype=np.float64), scale),
        m_sub, ksub, n_iters,
    )


def assign_np(Q: np.ndarray, coarse: np.ndarray) -> np.ndarray:
    """Exact-int64 nearest-coarse-centroid ids (ties → lowest id) —
    numpy twin of ``kmeans.assign_expr``, shared by residual training,
    the GEMM encode kernel and the q162 oracle."""
    coarse = np.asarray(coarse, dtype=np.int64)
    c2 = (coarse * coarse).sum(axis=1)
    D = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ coarse.T) + c2
    return np.argmin(D, axis=1)


def pq_fit(
    embeddings: DataFrame,
    m_sub: int = 4,
    ksub: int = 16,
    n_lists: int | None = None,
    n_iters: int = 3,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    by_residual: bool = False,
) -> dict:
    """Train the IVF-PQ model on the deterministic driver sample.

    Returns {"coarse": list[k][dim] int, "codebooks": list[m][ksub][dsub]
    int, "m_sub", "ksub", "scale", "by_residual"} — plain ints so the
    model embeds directly as plan literals / oracle VALUES. With
    ``by_residual=True`` the codebooks are trained on the sample's
    residuals against its coarse assignment (FAISS by_residual=true) —
    same integer Lloyd, residual rows in."""
    from osm_spark.text.ann import auto_n_lists

    pdf = (
        embeddings.where(F.col(id_col) % sample_mod == 0)
        .select(id_col, vec_col)
        .toPandas()
    )
    ids = pdf[id_col].to_numpy(np.int64)
    X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    if n_lists is None:
        n_lists = auto_n_lists(len(pdf) * sample_mod)
    Q = quantize_np(X, scale)
    coarse = train_pq_q(ids, Q, 1, n_lists, n_iters)[0]
    if by_residual:
        R = Q - coarse[assign_np(Q, coarse)]
        books = train_pq_q(ids, R, m_sub, ksub, n_iters)
    else:
        books = train_pq_q(ids, Q, m_sub, ksub, n_iters)
    return {
        "coarse": [[int(v) for v in c] for c in coarse],
        "codebooks": [
            [[int(v) for v in c] for c in book] for book in books
        ],
        "m_sub": m_sub,
        "ksub": ksub,
        "scale": scale,
        "by_residual": by_residual,
    }


def _coarse_lit(coarse: list) -> Column:
    """array<array<long>> literal of the coarse centroids — lets the
    residual ``eq − coarse[list_id]`` stay a Catalyst expression
    (element_at on the computed list id, zip_with subtraction)."""
    return F.array(
        *[
            F.array(*[F.lit(int(v)).cast("long") for v in c])
            for c in coarse
        ]
    )


def _residual_col(vec: Column, coarse: list, list_id: Column) -> Column:
    """array<long> residual ``vec − coarse[list_id]`` (exact int64)."""
    return F.zip_with(
        vec,
        F.element_at(_coarse_lit(coarse), list_id + F.lit(1)),
        lambda a, b: a - b,
    )


def pq_codes_col(qcol: Column, codebooks: list, dim: int) -> Column:
    """array<int> of m_sub codes — per-subspace exact-int argmin via
    the kmeans assign fold on the sliced vector (ties to lowest code).
    Catalyst path: right for small ksub·m_sub; see pq_encode for the
    bit-identical Arrow GEMM at wide configurations."""
    m_sub = len(codebooks)
    dsub = dim // m_sub
    return F.array(
        *[
            assign_expr(
                F.slice(qcol, s * dsub + 1, dsub), codebooks[s]
            )["cid"]
            for s in range(m_sub)
        ]
    )


def pq_lut_col(qcol: Column, codebooks: list, dim: int) -> Column:
    """array<array<long>> — LUT[s][code+1] = exact int64 d2 between the
    query's subspace-s slice and codebook entry ``code``. Per-query
    cost m_sub·ksub folds of dsub terms = one full-dim scan per
    codebook entry; queries are the small side by contract."""
    from osm_spark.text.kmeans import _d2_expr

    m_sub = len(codebooks)
    dsub = dim // m_sub
    return F.array(
        *[
            F.array(
                *[
                    _d2_expr(F.slice(qcol, s * dsub + 1, dsub), c)
                    for c in codebooks[s]
                ]
            )
            for s in range(m_sub)
        ]
    )


def _encode_gemm(df: DataFrame, model: dict, dim: int) -> DataFrame:
    """(neighbor_id, eq, list_id, codes) via one Arrow int64 GEMM pass
    — bit-identical to the catalyst folds (integer arithmetic, same
    first-min ties; pinned by test_pq). The throughput encode for wide
    ksub·m_sub where the fold expression tree would blow past codegen
    limits. Zero shuffle; codebooks ride the task closure."""
    coarse = np.asarray(model["coarse"], dtype=np.int64)
    books = np.asarray(model["codebooks"], dtype=np.int64)
    by_residual = bool(model.get("by_residual"))
    m_sub, ksub, dsub = books.shape
    b2 = (books * books).sum(axis=2)  # (m_sub, ksub)

    def enc(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.asarray(pdf["eq"].tolist(), dtype=np.int64)
            lid = assign_np(Q, coarse).astype(np.int32)
            E = Q - coarse[lid] if by_residual else Q
            codes = np.empty((len(Q), m_sub), dtype=np.int32)
            for s in range(m_sub):
                Qs = E[:, s * dsub : (s + 1) * dsub]
                Ds = (
                    (Qs * Qs).sum(axis=1)[:, None]
                    - 2 * (Qs @ books[s].T)
                    + b2[s]
                )
                codes[:, s] = np.argmin(Ds, axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"],
                    "eq": pdf["eq"],
                    "list_id": lid,
                    "codes": list(codes),
                }
            )

    return df.mapInPandas(
        enc,
        "neighbor_id long, eq array<long>, list_id int, codes array<int>",
    )


def pq_encode(
    embeddings: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "catalyst",
) -> DataFrame:
    """(neighbor_id, eq, list_id, codes) — the persisted search
    artifact. ``eq`` (the quantized vector) is carried for the refine
    re-rank; a codes-only projection is the 4-B/row scan path."""
    dim = len(model["coarse"][0])
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_vectors(embeddings, vec_col, model["scale"]).alias("eq"),
    )
    if kernel == "numpy":
        return _encode_gemm(base, model, dim)
    if kernel != "catalyst":
        raise ValueError(f"unknown kernel {kernel!r}")
    assigned = base.select(
        "neighbor_id",
        "eq",
        assign_expr(F.col("eq"), model["coarse"])["cid"].alias("list_id"),
    )
    enc_vec = (
        _residual_col(F.col("eq"), model["coarse"], F.col("list_id"))
        if model.get("by_residual")
        else F.col("eq")
    )
    return assigned.select(
        "neighbor_id",
        "eq",
        "list_id",
        pq_codes_col(enc_vec, model["codebooks"], dim).alias("codes"),
    )


def _query_side_gemm(
    queries: DataFrame, model: dict, n_probe: int
) -> DataFrame:
    """(query_id, qq, lut, list_id) via one Arrow int64 GEMM pass —
    bit-identical to the catalyst probe/LUT columns (pinned by
    test_pq). The catalyst expressions are linear in n_lists·dim and
    m_sub·ksub·dsub PLAN NODES; past a few thousand terms the plan
    itself becomes the bottleneck, so wide configurations build the
    query side here (the encode-side _encode_gemm argument, applied to
    the probe side)."""
    coarse = np.asarray(model["coarse"], dtype=np.int64)
    books = np.asarray(model["codebooks"], dtype=np.int64)
    by_residual = bool(model.get("by_residual"))
    m_sub, ksub, dsub = books.shape
    c2 = (coarse * coarse).sum(axis=1)
    ids = np.arange(coarse.shape[0])

    def lut_of(vec: np.ndarray) -> list:
        lut = []
        for s in range(m_sub):
            qs = vec[s * dsub : (s + 1) * dsub]
            diff = books[s] - qs[None, :]
            lut.append([int(v) for v in (diff * diff).sum(axis=1)])
        return lut

    def qside(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.asarray(pdf["qq"].tolist(), dtype=np.int64)
            D = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ coarse.T) + c2
            out = []
            for r in range(len(Q)):
                order = np.lexsort((ids, D[r]))
                raw_lut = None if by_residual else lut_of(Q[r])
                for p in order[:n_probe]:
                    # residual mode: the LUT is per (query, probe
                    # list) — built from q − c_p, NOT from q.
                    lut = (
                        lut_of(Q[r] - coarse[p]) if by_residual else raw_lut
                    )
                    out.append(
                        (int(pdf["query_id"].iloc[r]),
                         [int(v) for v in Q[r]],
                         lut,
                         int(p))
                    )
            yield pd.DataFrame(
                out, columns=["query_id", "qq", "lut", "list_id"]
            )

    return queries.mapInPandas(
        qside,
        "query_id long, qq array<long>, lut array<array<long>>, "
        "list_id int",
    )


def _probes_col(qcol: Column, coarse: list, n_probe: int) -> Column:
    """array<int> of the n_probe nearest coarse list ids — exact int64
    d2, ties to the lower id (struct sort on (d2, cid))."""
    from osm_spark.text.kmeans import _d2_expr

    ranked = F.sort_array(
        F.array(
            *[
                F.struct(
                    _d2_expr(qcol, c).alias("d2"),
                    F.lit(j).cast("int").alias("cid"),
                )
                for j, c in enumerate(coarse)
            ]
        )
    )
    return F.transform(
        F.slice(ranked, 1, n_probe), lambda s: s["cid"]
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    model: dict,
    k: int = 5,
    n_probe: int = 4,
    refine: int = 0,
    encoded: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encode_kernel: str = "catalyst",
    query_kernel: str = "catalyst",
) -> DataFrame:
    """IVF-PQ search: probe → ADC rank over codes → optional exact
    refine. Output (query_id, neighbor_id, adc_d2, rank, n_candidates
    [, d2]); ranks are (distance asc, neighbor_id asc) — fully
    deterministic. ``refine=R`` re-ranks the R-row ADC head per query
    by exact int64 d2 and returns the top-k of THAT order (FAISS's
    IndexRefineFlat); refine=0 returns the raw ADC top-k."""
    dim = len(model["coarse"][0])
    e = encoded if encoded is not None else pq_encode(
        embeddings, model, id_col, vec_col, encode_kernel
    )
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_vectors(queries, vec_col, model["scale"]).alias("qq"),
    )
    if query_kernel == "numpy":
        q = _query_side_gemm(qbase, model, n_probe)
    elif query_kernel == "catalyst":
        if model.get("by_residual"):
            # Residual LUTs are per (query, probe list): explode the
            # probes FIRST, then build each row's LUT from q − c_list.
            probed = qbase.select(
                "query_id",
                "qq",
                F.explode(
                    _probes_col(F.col("qq"), model["coarse"], n_probe)
                ).alias("list_id"),
            )
            rq = _residual_col(
                F.col("qq"), model["coarse"], F.col("list_id")
            )
            q = probed.select(
                "query_id",
                "qq",
                pq_lut_col(rq, model["codebooks"], dim).alias("lut"),
                "list_id",
            )
        else:
            q = qbase.select(
                "query_id",
                "qq",
                pq_lut_col(
                    F.col("qq"), model["codebooks"], dim
                ).alias("lut"),
                F.explode(
                    _probes_col(F.col("qq"), model["coarse"], n_probe)
                ).alias("list_id"),
            )
    else:
        raise ValueError(f"unknown kernel {query_kernel!r}")
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda c, l: F.element_at(l, c + 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = (
        q.join(e, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qq", "neighbor_id", "eq", adc.alias("adc_d2"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    n_cand = Window.partitionBy("query_id")
    ranked = cand.withColumn(
        "n_candidates", F.count("*").over(n_cand)
    ).withColumn("rank", F.row_number().over(w_adc))
    if not refine:
        return ranked.where(F.col("rank") <= k).select(
            "query_id", "neighbor_id", "adc_d2", "rank", "n_candidates"
        )
    d2 = F.aggregate(
        F.zip_with(F.col("qq"), F.col("eq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w_ref = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        ranked.where(F.col("rank") <= refine)
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w_ref))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "adc_d2", "d2", "rank", "n_candidates"
        )
    )


def exact_int_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Exact int64-d2 top-k (labeled brute baseline — the PQ recall
    ground truth; quantized metric so ties and ranks are engine-
    portable)."""
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_vectors(embeddings, vec_col, scale).alias("eq"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_vectors(queries, vec_col, scale).alias("qq"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qq"), F.col("eq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        q.crossJoin(e)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
