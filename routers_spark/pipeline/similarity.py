"""Similarity search over an embedding column (array<float>).

  - ``brute_topk_cosine``: exact baseline — block-matmul numpy inside
    ``mapInPandas`` against a broadcast query matrix (no shuffle).
  - ``lsh_topk_cosine``: the scale path — random-hyperplane sign buckets
    (SimHash for vectors) turn the all-pairs scan into a bucket equi-join;
    exact cosine re-rank inside buckets. Recall < 1 by design; verified
    against brute force in tests (recall floor asserted).

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


def lsh_topk_cosine(corpus_df: DataFrame, query_vecs: np.ndarray,
                    query_ids: np.ndarray, k: int = 10, n_planes: int = 8,
                    n_tables: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ANN path: per hash table, bucket both sides by hyperplane signs and
    only score in-bucket candidates; union tables, dedup, exact re-rank."""
    spark = corpus_df.sparkSession
    dim = len(query_vecs[0])
    planes = [deterministic_planes(dim, n_planes, seed=100 + t)
              for t in range(n_tables)]
    q = np.asarray(query_vecs, dtype=np.float64)
    q_ids = np.asarray(query_ids)
    q_buckets = np.stack([sign_bucket(q, p) for p in planes])  # (tables, nq)
    bq = spark.sparkContext.broadcast((q, q_ids, q_buckets, planes))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_, q_ids_, q_buckets_, planes_ = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            m_ids = pdf[id_col].values
            cand_mask = np.zeros((len(m), len(q_)), dtype=bool)
            for t, p in enumerate(planes_):
                mb = sign_bucket(m, p)
                cand_mask |= mb[:, None] == q_buckets_[t][None, :]
            qn = q_ / np.maximum(np.linalg.norm(q_, axis=1, keepdims=True), 1e-30)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = np.where(cand_mask, mn @ qn.T, -np.inf)
            out = {"query_id": [], "vec_id": [], "cosine": [], "rank": []}
            for j in range(sims.shape[1]):
                col = sims[:, j]
                idx = np.flatnonzero(np.isfinite(col))
                if not len(idx):
                    continue
                kk = min(k, len(idx))
                top = idx[np.argpartition(-col[idx], kk - 1)[:kk]]
                top = top[np.lexsort((m_ids[top], -col[top]))]
                out["query_id"] += [int(q_ids_[j])] * len(top)
                out["vec_id"] += m_ids[top].tolist()
                out["cosine"] += col[top].tolist()
                out["rank"] += list(range(1, len(top) + 1))
            yield pd.DataFrame(out)

    partial = corpus_df.select(id_col, vec_col).mapInPandas(gen, schema=TOPK_SCHEMA)
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    )
    return partial.withColumn("rank", w).filter(F.col("rank") <= k)
