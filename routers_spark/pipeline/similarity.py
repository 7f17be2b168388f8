"""Similarity search over an embedding column (array<float>).

  - ``brute_topk_cosine``: exact baseline — block-matmul numpy inside
    ``mapInPandas`` against a broadcast query matrix (no shuffle).
  - ``lsh_topk_cosine``: scale path 1 — random-hyperplane sign buckets
    (SimHash for vectors) turn the all-pairs scan into a bucket equi-join;
    exact cosine re-rank inside buckets. Recall < 1 by design; verified
    against brute force in tests (recall floor asserted).
  - ``ivf_topk_cosine``: scale path 2 — FAISS-style inverted lists: a
    spherical-k-means coarse quantizer (trained once on a deterministic
    distributed sample), one inverted-list row per vector, queries probe
    their ``nprobe`` nearest lists. ``nprobe == nlist`` degenerates to the
    exact scan (asserted in tests).

Hyperplanes are derived deterministically from splitmix64 streams — no RNG
state, so executors regenerate identical planes from the seed alone.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from routers_spark.functions.hashing import mix_np


def deterministic_planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """(n_planes, dim) hyperplanes from splitmix64 streams mapped to
    [-1, 1) — deterministic across processes (no RNG object state)."""
    with np.errstate(over="ignore"):  # uint64 wrap is the contract
        idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed) * np.uint64(
            0x9E3779B97F4A7C15
        )
    u = mix_np(idx).astype(np.float64) / float(2**64)
    return (u * 2.0 - 1.0).reshape(n_planes, dim)


def sign_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bucket id = packed sign bits of plane projections (uint64,
    n_planes <= 63)."""
    signs = (vecs @ planes.T) > 0.0
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    return (signs.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)


def _cosine_topk_block(q: np.ndarray, q_ids: np.ndarray, m: np.ndarray,
                       m_ids: np.ndarray, k: int) -> pd.DataFrame:
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = mn @ qn.T  # (n_corpus, n_query)
    out = {"query_id": [], "vec_id": [], "cosine": [], "rank": []}
    kk = min(k, sims.shape[0])
    for j in range(sims.shape[1]):
        col = sims[:, j]
        top = np.argpartition(-col, kk - 1)[:kk]
        # deterministic order: by (-cosine, vec_id)
        top = top[np.lexsort((m_ids[top], -col[top]))]
        out["query_id"] += [int(q_ids[j])] * len(top)
        out["vec_id"] += m_ids[top].tolist()
        out["cosine"] += col[top].tolist()
        out["rank"] += list(range(1, len(top) + 1))
    return pd.DataFrame(out)


TOPK_SCHEMA = "query_id long, vec_id long, cosine double, rank int"


def brute_topk_cosine(corpus_df: DataFrame, query_vecs: np.ndarray,
                      query_ids: np.ndarray, k: int = 10,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Exact top-k: queries broadcast, corpus partitions scanned once with
    block matmul, per-partition top-k then a global re-rank (the classic
    tree-aggregate top-k shape)."""
    spark = corpus_df.sparkSession
    bq = spark.sparkContext.broadcast(
        (np.asarray(query_vecs, dtype=np.float64), np.asarray(query_ids))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q, q_ids = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            yield _cosine_topk_block(q, q_ids, m, pdf[id_col].values, k)

    partial = corpus_df.select(id_col, vec_col).mapInPandas(gen, schema=TOPK_SCHEMA)
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    )
    return partial.withColumn("rank", w).filter(F.col("rank") <= k)


def build_lsh_index(corpus_df: DataFrame, dim: int, n_planes: int = 8,
                    n_tables: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Bucket the corpus ONCE into (id, table, bucket) rows — the persistent
    ANN index (one narrow Arrow pass, n_tables rows per vector). The index
    carries IDS ONLY: at 100 TB the embedding is the heaviest column, and
    duplicating it n_tables× through the index shuffle/storage multiplies
    exactly that column (round-2 verdict #4). Vectors are re-joined by id
    AFTER the probe prunes candidates, so the heavy column moves once and
    only for surviving rows. At scale the index is written out partitioned
    by (t, bucket) and reused across query batches; probe compute scales
    with bucket occupancy, not corpus size."""
    planes = [deterministic_planes(dim, n_planes, seed=100 + t)
              for t in range(n_tables)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            frames = []
            for t, p in enumerate(planes):
                frames.append(pd.DataFrame({
                    id_col: pdf[id_col].values,
                    "t": t,
                    "bucket": sign_bucket(m, p),
                }))
            yield pd.concat(frames, ignore_index=True)

    return corpus_df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, t int, bucket long")


def lsh_index_pairs(index: DataFrame, id_col: str = "vec_id",
                    bucket_cap: int | None = 10_000) -> DataFrame:
    """(id_a, id_b) candidate pairs from an (id, t, bucket) LSH index via
    bucketed SELF-join — never all-pairs.

    ``bucket_cap`` bounds the quadratic cliff a degenerate bucket opens
    (all-zero embeddings are common in real corpora: one bucket holding k
    rows self-joins into k²/2 pairs). Buckets above the cap are SALT-SPLIT:
    members spread deterministically (splitmix of id) over
    ceil(cnt/cap) sub-buckets and pairs form only within a sub-bucket, so
    per-bucket pair work is ≤ nsplit·cap²/2 ≈ cnt·cap/2 — linear in
    occupancy instead of quadratic. Nothing is dropped outright; forgone
    cross-salt pairs trade bounded recall inside pathological buckets for
    a bounded shuffle — and because each table salts independently, a pair
    split apart in one table still co-buckets in another with probability
    1/nsplit per remaining table. The hot-bucket list is ≤ rows/cap
    entries — broadcast-sized by construction."""
    if bucket_cap is not None:
        counts = index.groupBy("t", "bucket").agg(
            F.count(F.lit(1)).alias("cnt"))
        hot = counts.filter(F.col("cnt") > bucket_cap)
        index = (
            index.join(F.broadcast(hot), ["t", "bucket"], "left")
            .withColumn("nsplit", F.when(
                F.col("cnt").isNull(), F.lit(1)
            ).otherwise(F.ceil(F.col("cnt") / bucket_cap).cast("int")))
            # salt varies WITH the table: a degenerate bucket has identical
            # membership in every table, so an id-only salt would forgo the
            # same pairs n_tables times — per-table splits are independent,
            # and each surviving table re-offers the pair
            .withColumn("salt", F.pmod(F.xxhash64(F.col(id_col), F.col("t")),
                                       F.col("nsplit")).cast("int"))
            .select(id_col, "t", "bucket", "salt")
        )
    else:
        index = index.select(id_col, "t", "bucket",
                             F.lit(0).alias("salt"))
    a = index.alias("a")
    b = index.alias("b")
    return (
        a.join(b, (F.col("a.t") == F.col("b.t"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.salt") == F.col("b.salt"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_dedup(corpus_df: DataFrame, threshold: float = 0.95,
                    n_planes: int = 8, n_tables: int = 4,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    bucket_cap: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate detection: the (table, bucket) LSH
    index SELF-joins (vectors sharing any bucket become candidate pairs —
    never all-pairs, hot buckets salt-split under ``bucket_cap``), an
    Arrow pass verifies exact cosine ≥ threshold, and connected components
    assign canonical ids (chains collapse, same as minhash_dedup).
    Output: (doc_id, canonical_id) for every corpus row.

    ``bucket_cap`` defaults to None (full within-bucket recall): the
    salt-split cap is a RECALL tradeoff — pairs split across salt
    sub-buckets are forgone — so callers opt in at scale (the bench/scale
    jobs pass 10_000) rather than silently losing duplicates by default."""
    from routers_spark.pipeline.dedup import connected_canonical_ids

    head = corpus_df.select(vec_col).first()
    if head is None:
        return corpus_df.select(F.col(id_col).alias("doc_id")).withColumn(
            "canonical_id", F.col("doc_id"))
    dim = len(head[0])
    # Persist the index (bounded registry): with the occupancy cap it is
    # read THREE times (hot-bucket counts + both self-join sides) — without
    # the persist each read re-executes the corpus-wide Arrow bucketing
    # pass, and correctness of the cap would silently lean on the index
    # being deterministic across executions.
    from routers_spark.functions.cache import bounded_persist

    index = bounded_persist(
        build_lsh_index(corpus_df, dim, n_planes, n_tables, id_col, vec_col),
        "lsh_index")
    # id-only self-join; vectors re-join AFTER the dedup'd candidate set is
    # known (the heavy column never rides the n_tables× index rows)
    vecs = corpus_df.select(id_col, vec_col)
    cand = (
        lsh_index_pairs(index, id_col, bucket_cap)
        .join(vecs.withColumnsRenamed({id_col: "id_a", vec_col: "vec_a"}),
              "id_a")
        .join(vecs.withColumnsRenamed({id_col: "id_b", vec_col: "vec_b"}),
              "id_b")
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.stack(pdf["vec_a"].values).astype(np.float64)
            vb = np.stack(pdf["vec_b"].values).astype(np.float64)
            va /= np.maximum(np.linalg.norm(va, axis=1, keepdims=True), 1e-30)
            vb /= np.maximum(np.linalg.norm(vb, axis=1, keepdims=True), 1e-30)
            cos = np.einsum("ij,ij->i", va, vb)
            yield pd.DataFrame({"doc_a": pdf["id_a"].values,
                                "doc_b": pdf["id_b"].values,
                                "cosine": cos})

    pairs = cand.mapInPandas(
        verify, schema="doc_a long, doc_b long, cosine double"
    ).filter(F.col("cosine") >= threshold)
    canon = connected_canonical_ids(pairs.select("doc_a", "doc_b"))
    return (
        corpus_df.select(F.col(id_col).alias("doc_id"))
        .join(canon, "doc_id", "left")
        .select("doc_id", F.coalesce("lbl", "doc_id").alias("canonical_id"))
    )


def train_ivf_centroids(corpus_df: DataFrame, nlist: int = 16,
                        iters: int = 10, sample: int = 4096, seed: int = 11,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """IVF coarse quantizer: spherical k-means trained driver-side on a
    deterministic sample (the standard IVF recipe — train on a sample,
    assign the full corpus distributed). The sample is the ``sample`` rows
    with the smallest splitmix64(id) — a stable uniform draw that any
    executor can reproduce, unlike TABLESAMPLE. Returns L2-normalized
    (nlist, dim) centroids."""
    from pyspark.sql.functions import pandas_udf

    from routers_spark.functions.hashing import mix_np

    @pandas_udf("long")
    def _mix(v: pd.Series) -> pd.Series:
        # low 63 bits: a signed orderBy key with the same uniform order
        return pd.Series((mix_np(v.values.astype(np.uint64))
                          >> np.uint64(1)).astype(np.int64))

    take = (
        corpus_df.select(id_col, vec_col)
        .withColumn("_h", _mix(F.col(id_col)))
        .orderBy("_h", id_col)            # distributed top-`sample` draw
        .limit(sample)
        .toPandas()
    )
    x = np.stack(take[vec_col].values).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    # deterministic init: evenly spaced rows of the (id-mixed) sample
    init_idx = np.linspace(0, len(x) - 1, nlist).astype(int)
    c = x[init_idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(nlist):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
            # empty list: keep the previous centroid (deterministic)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
    return c


def build_ivf_index(corpus_df: DataFrame, centroids: np.ndarray,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Assign every corpus vector to its nearest centroid's inverted list —
    one narrow Arrow pass against the broadcast quantizer. The index rows
    are (id, list_id) ONLY — the embedding re-joins by id after the probe,
    so the heaviest column never rides the index shuffle (round-2 verdict
    #4). At scale this is written out partitioned by ``list_id`` and reused
    across query batches (the persistent IVF index); exactly one row per
    vector (vs the LSH index's n_tables rows)."""
    spark = corpus_df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "list_id": np.argmax(mn @ c.T, axis=1).astype(np.int32),
            })

    return corpus_df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, list_id int")


def ivf_topk_cosine(corpus_df: DataFrame, query_vecs: np.ndarray,
                    query_ids: np.ndarray, k: int = 10, nlist: int = 16,
                    nprobe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    centroids: np.ndarray | None = None,
                    index_df: DataFrame | None = None) -> DataFrame:
    """IVF ANN: each query probes its ``nprobe`` nearest inverted lists (a
    tiny broadcast probe table), exact cosine runs only inside the probed
    lists, window re-rank gives top-k. Work scales with
    nprobe/nlist of the corpus, not corpus size; ``nprobe == nlist``
    degenerates to the exact brute scan (asserted in tests). Pass
    ``centroids``/``index_df`` (persisted) to skip re-training/re-assigning."""
    spark = corpus_df.sparkSession
    q = np.asarray(query_vecs, dtype=np.float64)
    q_ids = np.asarray(query_ids)
    if centroids is None:
        centroids = train_ivf_centroids(corpus_df, nlist=nlist,
                                        id_col=id_col, vec_col=vec_col)
    if index_df is None:
        index_df = build_ivf_index(corpus_df, centroids, id_col, vec_col)

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    near = np.argsort(-(qn @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    probe_rows = [
        (int(near[i, p]), int(q_ids[i]))
        for i in range(len(q_ids)) for p in range(near.shape[1])
    ]
    probes = spark.createDataFrame(probe_rows, "list_id int, query_id long")

    cand = (
        index_df.join(F.broadcast(probes), "list_id")
        .select(id_col, "query_id")
        .join(corpus_df.select(id_col, vec_col), id_col)
    )

    return _score_and_rank(cand, qn, q_ids, k, id_col, vec_col)


def _score_and_rank(cand: DataFrame, qn: np.ndarray, q_ids: np.ndarray,
                    k: int, id_col: str, vec_col: str) -> DataFrame:
    """Shared ANN tail (LSH + IVF): exact cosine of each (candidate, query)
    pair in one Arrow pass against the broadcast normalized queries, then a
    per-query window re-rank to top-k (ties to the lowest vec_id).
    ``cand``: (id_col, vec_col, query_id) candidate rows."""
    spark = cand.sparkSession
    q_sorted = np.sort(q_ids)
    q_order = np.argsort(q_ids)
    bq = spark.sparkContext.broadcast((qn[q_order], q_sorted))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qn_, qid_sorted = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            qrow = np.searchsorted(qid_sorted, pdf["query_id"].values)
            cos = np.einsum("ij,ij->i", mn, qn_[qrow])
            yield pd.DataFrame({
                "query_id": pdf["query_id"].values,
                "vec_id": pdf[id_col].values,
                "cosine": cos,
                "rank": 0,
            })

    scored = cand.mapInPandas(score, schema=TOPK_SCHEMA)
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    )
    return scored.withColumn("rank", w).filter(F.col("rank") <= k)


def lsh_topk_cosine(corpus_df: DataFrame, query_vecs: np.ndarray,
                    query_ids: np.ndarray, k: int = 10, n_planes: int = 8,
                    n_tables: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    index_df: DataFrame | None = None) -> DataFrame:
    """ANN path: the corpus's (table, bucket) index is EQUI-JOINED with the
    query buckets (a tiny broadcast side), so the exact cosine is computed
    only for in-bucket candidates — work scales with bucket occupancy, not
    corpus size. Union over tables dedups per (query, vector); exact
    re-rank gives the final top-k. Pass ``index_df`` (build_lsh_index
    output, persisted) to skip re-bucketing.

    Candidate membership is identical to scoring-with-a-mask, so recall vs
    brute force is unchanged (floor asserted in tests)."""
    spark = corpus_df.sparkSession
    q = np.asarray(query_vecs, dtype=np.float64)
    q_ids = np.asarray(query_ids)
    dim = q.shape[1]
    planes = [deterministic_planes(dim, n_planes, seed=100 + t)
              for t in range(n_tables)]
    if index_df is None:
        index_df = build_lsh_index(corpus_df, dim, n_planes, n_tables,
                                   id_col, vec_col)

    # query probe rows: (t, bucket, query_id) — tiny, broadcast by Catalyst
    probe_rows = [
        (t, int(b), int(qid))
        for t, p in enumerate(planes)
        for b, qid in zip(sign_bucket(q, p), q_ids)
    ]
    probes = spark.createDataFrame(probe_rows, "t int, bucket long, query_id long")

    cand = (
        index_df.join(F.broadcast(probes), ["t", "bucket"])
        .select(id_col, "query_id")
        .dropDuplicates([id_col, "query_id"])
        .join(corpus_df.select(id_col, vec_col), id_col)
    )

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    return _score_and_rank(cand, qn, q_ids, k, id_col, vec_col)
