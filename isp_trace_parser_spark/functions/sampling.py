"""Deterministic hash-based sampling for training-data curation.

``df.sample()`` draws from a per-split RNG: the kept set changes with
partitioning, task retries, and cluster size — unacceptable for a
reproducible 100-TB curation run (two executors retrying a task must
keep the same rows). These samplers key the keep-decision on a HASH of
the row's identity instead:

- same input => same sample, on any cluster size, forever;
- monotone: ``sample(r1) ⊆ sample(r2)`` when ``r1 <= r2`` (one hash,
  compared against two thresholds) — growing a sample never discards
  already-kept rows, so downstream caches/shards stay valid;
- stratified: per-stratum rates (downsample the Zipf-head languages /
  domains, keep the rare tail whole) as one map lookup — no per-stratum
  jobs, one scan, fully pushdown-friendly (the filter is a pure column
  predicate).

All JVM-side column expressions; no UDF, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def sample_bucket(key_cols: list[str | Column], seed: int = 0) -> Column:
    """Uniform bucket in [0, 1e6) from xxhash64 of the identity columns
    (two-lane seeding as operators/dedup.py — xxhash64 is uniform on
    arbitrary input)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: list[str | Column],
    seed: int = 0,
    bucket: Column | None = None,
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically keyed on ``key_cols``.
    ``bucket`` overrides the hash (e.g. a pre-computed or an
    engine-portable bucket expression for cross-engine verification)."""
    b = bucket if bucket is not None else sample_bucket(key_cols, seed)
    return df.where(b < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_cols: list[str | Column],
    default_rate: float = 1.0,
    seed: int = 0,
    bucket: Column | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling: rows in stratum ``s`` survive
    with probability ``rates.get(s, default_rate)``, decided by the same
    identity hash everywhere. One scan, one pure-column predicate."""
    pairs: list[Column] = []
    for k, v in rates.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(int(v * _BUCKETS)))
    threshold = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None),
        F.lit(int(default_rate * _BUCKETS)),
    )
    b = bucket if bucket is not None else sample_bucket(key_cols, seed)
    return df.where(b < threshold)


def export_shards(
    df: DataFrame,
    n_shards: int,
    key_cols: list[str | Column],
    order_cols: list[str | Column],
    seed: int = 0,
    bucket: Column | None = None,
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic training-data export sharding (webdataset-style):
    every row gets a stable ``(shard, shard_pos)`` address — shard from
    the identity hash, position from a total order within the shard —
    so a re-run of the export on any cluster size produces byte-
    identical shard files and downstream loaders can resume by
    (shard, pos) watermark.

    One shuffle (window partitioned by shard); the per-shard sort is
    the per-output-file sort the writer needs anyway. Shard count is
    the parallelism unit — size it to the target shard file size
    (e.g. rows * bytes/row / 1 GB), not the cluster.
    """
    from pyspark.sql import Window

    b = bucket if bucket is not None else sample_bucket(key_cols, seed)
    shard = F.pmod(b, F.lit(n_shards))
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(shard_col).orderBy(*ocols)
    return (
        df.withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w) - F.lit(1))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    shard_col: str,
    order_cols: list[str | Column],
) -> DataFrame:
    """GPT-style pretraining sequence packing manifest: within each
    shard, documents are concatenated in a deterministic order and the
    token stream is split every ``seq_len`` tokens (documents may
    straddle pack boundaries — the standard concat-then-split
    convention). Emits per document its token offset in the shard
    stream, the pack it starts in, the pack it ends in, and its offset
    inside the start pack — everything a loader needs to materialize
    pack ``k`` without scanning the shard.

    Packing is PER SHARD (the window partitions on the shard key), so
    the running token sum never becomes a single-partition global
    window — shards are the parallelism unit at 100 TB exactly as in
    :func:`export_shards`. Pure integer window arithmetic (`div`/`%`
    on longs — exact at any stream length); no UDF; one exchange.
    """
    from pyspark.sql import Window

    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    L = int(seq_len)
    n = F.col(n_tokens_col).cast("long")
    base = df.select(
        F.col(id_col),
        F.col(shard_col),
        n.alias("n_tokens"),
        (F.sum(n).over(w) - n).alias("token_offset"),
    )
    return base.select(
        id_col,
        shard_col,
        "n_tokens",
        "token_offset",
        F.expr(f"token_offset div {L}").alias("start_pack"),
        F.expr(
            f"(token_offset + greatest(n_tokens - 1, 0)) div {L}"
        ).alias("end_pack"),
        (F.col("token_offset") % F.lit(L)).alias("offset_in_pack"),
    )


def pack_read_plan(
    manifest: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Loader-side inverse of :func:`pack_sequences`: from the packing
    manifest, the exact (doc, token-slice) list each pack needs —
    ``(shard, pack, doc_id, doc_from, doc_to)`` with ``[doc_from,
    doc_to)`` the half-open token range of the document that lands in
    that pack. A trainer materializing pack ``k`` reads just these
    slices, in (pack, token_offset) order, and never scans the shard.

    One ``sequence``-explode per document over its ``start_pack ..
    end_pack`` span (documents span ``n_tokens/seq_len + 1`` packs on
    average, so the fan-out is ~(1 + tokens/L) rows per doc) and pure
    integer arithmetic; no shuffle at all — the plan is a projection
    of the manifest.
    """
    L = int(seq_len)
    k = F.col("pack")
    lo = k * L - F.col("token_offset")
    return (
        manifest.select(
            F.col(shard_col),
            F.col(id_col),
            "token_offset",
            "n_tokens",
            F.explode(
                F.sequence(F.col("start_pack"), F.col("end_pack"))
            ).alias("pack"),
        )
        .select(
            shard_col,
            "pack",
            id_col,
            F.greatest(lo, F.lit(0)).alias("doc_from"),
            F.least(F.col("n_tokens"), lo + L).alias("doc_to"),
        )
        .where(F.col("doc_to") > F.col("doc_from"))
    )
