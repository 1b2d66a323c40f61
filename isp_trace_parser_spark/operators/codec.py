"""Gorilla-style block codec: delta-of-delta timestamps + XOR floats,
bit-packed per (series, time-bucket) block into a binary column.

North_rule: "Gorilla XOR + delta-of-delta compression of per-url numeric
trace blocks stored as binary columns". Design choices vs the Gorilla
paper (Pelkonen et al., VLDB 2015):

- Per-point semantics identical: timestamps are delta-of-delta encoded,
  values are XORed against the previous value.
- Bit windows are chosen PER BLOCK (max zigzag(dod) width; min
  leading/trailing zero window over the block's nonzero XORs) instead of
  per point. This loses a few % of ratio on pathological streams but
  makes BOTH encode and decode pure vectorized numpy (per-point adaptive
  windows form a sequential dependency chain that cannot vectorize
  without a JIT, and this sandbox has none). At 10^12 rows the codec
  must run at memory bandwidth, not Python-loop speed.
- Half-hourly regular series (the engine's canonical traces,
  reference trace_formatter.py:12-15) have constant deltas, so dod == 0
  for every point after the first two and the timestamp stream packs to
  ~0 bits/point — same asymptotics as the paper.

Block layout (little-endian)::

    u32 n_points | i64 t0_us | i64 d0_us | u8 ts_width
    u8 v_lead | u8 v_width | u64 first_value_bits
    <ts bits: zigzag(dod[2..n)) @ ts_width each, byte-aligned at end>
    <nonzero bitmap: n-1 bits, 1 = xor != 0 (Gorilla's '0' control bit
     for repeated values, as a separate vectorizable stream)>
    <value bits: (xor >> v_trail) @ v_width for each NONZERO xor>

Spark integration: ``encode_blocks`` groups points into
(series, block_start) via ``applyInPandas`` (Arrow batches, numpy
inside); ``decode_blocks`` is ``mapInPandas`` back to points. Blocks are
keyed by the same time-bucket + url partitioning as the tier tables, so
encoding adds no extra shuffle beyond the rollup's.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    DoubleType,
)

_HEADER = struct.Struct("<IqqBBBQ")


# ---------------------------------------------------------------- bit kit
def _pack_fixed(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values at a fixed bit width, MSB-first. Vectorized:
    one bit-position index per output bit, no Python loop."""
    if width == 0 or len(vals) == 0:
        return b""
    n = len(vals)
    total = n * width
    tok = np.repeat(np.arange(n, dtype=np.int64), width)
    pos = np.tile(np.arange(width - 1, -1, -1, dtype=np.uint64), n)
    bits = (vals[tok] >> pos) & np.uint64(1)
    return np.packbits(bits.astype(np.uint8)).tobytes()


def _unpack_fixed(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`_pack_fixed`."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[: n * width]
    bits = bits.reshape(n, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits * weights).sum(axis=1, dtype=np.uint64)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


def _bit_width(vals: np.ndarray) -> int:
    if len(vals) == 0:
        return 0
    m = int(vals.max())
    return m.bit_length()


def _clz64(x: np.ndarray) -> np.ndarray:
    """Leading-zero count per uint64 (vectorized via float64 exponent
    trick is unsafe past 2^53; use byte-wise table instead)."""
    res = np.full(len(x), 64, dtype=np.int64)
    cur = x.copy()
    shift = np.zeros(len(x), dtype=np.uint64)
    # binary search over bit ranges
    for w in (32, 16, 8, 4, 2, 1):
        mask = cur >> np.uint64(w) != 0
        res[mask] -= w
        cur = np.where(mask, cur >> np.uint64(w), cur)
    nz = x != 0
    out = np.where(nz, res - 1, 64)
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    nz = x != 0
    lsb = x & (~x + np.uint64(1))
    # log2 of an exact power of two <= 2^63: float64 is exact here
    out = np.where(nz, np.log2(lsb.astype(np.float64) + (x == 0)).astype(np.int64), 64)
    return out


# ---------------------------------------------------------------- block codec
def encode_block(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one block. ``ts_us``: int64 epoch microseconds, sorted
    ascending; ``values``: float64."""
    n = len(ts_us)
    assert n > 0 and len(values) == n
    t0 = int(ts_us[0])
    d0 = int(ts_us[1] - ts_us[0]) if n > 1 else 0

    if n > 2:
        deltas = np.diff(ts_us)
        dod = deltas[1:] - deltas[:-1]
        zz = _zigzag(dod.astype(np.int64))
        ts_width = _bit_width(zz)
        ts_payload = _pack_fixed(zz, ts_width)
    else:
        ts_width = 0
        ts_payload = b""

    bits = values.view(np.uint64)
    first_bits = int(bits[0])
    if n > 1:
        xors = bits[1:] ^ bits[:-1]
        nz_mask = xors != 0
        bitmap = np.packbits(nz_mask.astype(np.uint8)).tobytes()
        nz = xors[nz_mask]
        if len(nz):
            lead = int(_clz64(nz).min())
            trail = int(_ctz64(nz).min())
            lead = min(lead, 63)
            v_width = 64 - lead - trail
            v_payload = _pack_fixed(nz >> np.uint64(trail), v_width)
        else:
            lead, v_width = 0, 0
            v_payload = b""
    else:
        bitmap = b""
        lead, v_width = 0, 0
        v_payload = b""

    header = _HEADER.pack(n, t0, d0, ts_width, lead, v_width, first_bits)
    return header + struct.pack("<I", len(ts_payload)) + ts_payload + bitmap + v_payload


def decode_block(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block -> (ts_us int64, values float64)."""
    n, t0, d0, ts_width, lead, v_width, first_bits = _HEADER.unpack_from(buf, 0)
    off = _HEADER.size
    (ts_len,) = struct.unpack_from("<I", buf, off)
    off += 4
    ts_payload = buf[off : off + ts_len]
    off += ts_len
    bitmap_len = (n - 1 + 7) // 8 if n > 1 else 0
    bitmap_buf = buf[off : off + bitmap_len]
    off += bitmap_len
    v_payload = buf[off:]

    ts = np.empty(n, dtype=np.int64)
    ts[0] = t0
    if n > 1:
        if n > 2:
            zz = _unpack_fixed(ts_payload, n - 2, ts_width)
            dod = _unzigzag(zz)
            deltas = np.empty(n - 1, dtype=np.int64)
            deltas[0] = d0
            deltas[1:] = d0 + np.cumsum(dod)
        else:
            deltas = np.array([d0], dtype=np.int64)
        ts[1:] = t0 + np.cumsum(deltas)

    vals_bits = np.empty(n, dtype=np.uint64)
    vals_bits[0] = np.uint64(first_bits)
    if n > 1:
        nz_mask = np.unpackbits(np.frombuffer(bitmap_buf, dtype=np.uint8))[
            : n - 1
        ].astype(bool)
        xors = np.zeros(n - 1, dtype=np.uint64)
        n_nz = int(nz_mask.sum())
        if v_width and n_nz:
            trail = 64 - lead - v_width
            xors[nz_mask] = _unpack_fixed(v_payload, n_nz, v_width) << np.uint64(trail)
        # XOR prefix "scan": sequential dependency, but np.bitwise_xor
        # accumulate is a single C loop — no Python per point.
        vals_bits[1:] = xors
        vals_bits = np.bitwise_xor.accumulate(vals_bits)
    return ts, vals_bits.view(np.float64)


# ---------------------------------------------------------------- spark layer
BLOCK_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("block_start", TimestampNTZType()),
        StructField("n_points", IntegerType()),
        StructField("raw_bytes", LongType()),
        StructField("enc_bytes", LongType()),
        StructField("data", BinaryType()),
    ]
)

POINT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("ts", TimestampNTZType()),
        StructField("value", DoubleType()),
    ]
)


def _encode_batch(ser, bs_us, ts_us, vals):
    """Encode every complete (series, block_start) group of one sorted
    slice -> a pyarrow RecordBatch of blocks. ``ser`` stays a pyarrow
    string array end to end (boundary compare and start-row gather run
    in Arrow C kernels — no per-row Python string materialization);
    only the per-block encode_block call is a Python-level loop (numpy
    inside)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(ser)
    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        change[1:] = np.asarray(
            pc.not_equal(ser.slice(1), ser.slice(0, n - 1))
        ) | (bs_us[1:] != bs_us[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    blobs = [None] * len(starts)
    enc_bytes = np.empty(len(starts), dtype=np.int64)
    for i, (s, e) in enumerate(zip(starts, ends)):
        blob = encode_block(ts_us[s:e], vals[s:e])
        blobs[i] = blob
        enc_bytes[i] = len(blob)
    idx = pa.array(starts)
    return pa.RecordBatch.from_arrays(
        [
            ser.take(idx),
            pa.array(bs_us[starts], pa.timestamp("us")),
            pa.array((ends - starts).astype(np.int32), pa.int32()),
            pa.array(((ends - starts) * 16).astype(np.int64), pa.int64()),
            pa.array(enc_bytes, pa.int64()),
            pa.array(blobs, pa.binary()),
        ],
        ["series", "block_start", "n_points", "raw_bytes", "enc_bytes", "data"],
    )


def encode_blocks(
    df: DataFrame,
    series_col: str = "series",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_value",
    block: str = "1 day",
    repartition: bool = True,
) -> DataFrame:
    """Points -> one encoded binary block per (series, block_start).

    Implementation: hash-repartition on (series, block_start) — the
    carry logic only needs each (series, block) GROUP to be contiguous
    within a sorted partition, not each whole series, so a hot series'
    history spreads across tasks instead of serializing one executor
    (the hot-domain skew the synth generator models). Sort within
    partitions by (series, block_start, ts), then a single
    ``mapInPandas`` pass that encodes every complete block in each
    Arrow batch, carrying the trailing partial block into the next
    batch. This amortizes the Python/Arrow boundary over thousands of
    blocks per call — ``applyInPandas`` per block pays that overhead
    per GROUP, which is 10-50x slower for small blocks.
    """
    keyed = df.select(
        F.col(series_col).alias("series"),
        F.window(F.col(ts_col) - F.expr("INTERVAL 1 SECOND"), block)["start"].alias(
            "block_start"
        ),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    # explicit partition count: column-only repartition lets AQE
    # coalesce by shuffle BYTES, and (series, block) co-location
    # compresses shuffle blocks so well that AQE collapses the encode
    # stage to a handful of tasks (observed 64 -> 13 at 69M rows),
    # starving the Python workers. The encode stage is CPU-bound per
    # ROW, not per byte — pin the fan-out at the session's shuffle
    # parallelism.
    try:
        n_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        # AQE-managed platforms may hold a non-integer ("auto")
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    # ``repartition=False``: the caller guarantees each series is wholly
    # contained in one input partition (e.g. the frame is already
    # hash-partitioned on the series key) — the carry logic only needs
    # (series, block) groups contiguous under the sort, so the encode
    # runs shuffle-free on the existing partitioning (measured ~0.4s of
    # a 3s roundtrip at bench scale). The default keeps the pinned
    # (series, block_start) fan-out, which also spreads one hot series
    # across tasks.
    if repartition:
        arranged = keyed.repartition(
            n_parts, "series", "block_start"
        ).sortWithinPartitions("series", "block_start", "ts")
    else:
        arranged = keyed.sortWithinPartitions(
            "series", "block_start", "ts"
        )

    def _gen(batches):
        # mapInArrow, not mapInPandas: timestamps arrive as int64 views
        # and the series strings never materialize as Python objects
        # (pandas conversion measured ~40% of the whole encode stage —
        # OPTIMIZATION_r06.md)
        import pyarrow as pa
        import pyarrow.compute as pc

        carry = None  # (ser pa.Array, bs_us, ts_us, vals) of last group
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ser = batch.column("series")
            if isinstance(ser, pa.ChunkedArray):  # defensive
                ser = ser.combine_chunks()
            bs_us = np.asarray(batch.column("block_start")).view(np.int64)
            ts_us = np.asarray(batch.column("ts")).view(np.int64)
            vals = np.asarray(batch.column("value"), dtype=np.float64)
            if carry is not None:
                ser = pa.concat_arrays([carry[0], ser])
                bs_us = np.concatenate([carry[1], bs_us])
                ts_us = np.concatenate([carry[2], ts_us])
                vals = np.concatenate([carry[3], vals])
                carry = None
            n = len(ser)
            # hold back the final (possibly incomplete) group: it may
            # continue in the next Arrow batch of this partition
            tail_mask = np.asarray(
                pc.equal(ser, ser[n - 1])
            ) & (bs_us == bs_us[n - 1])
            cut = n - int(tail_mask.sum())
            carry = (
                ser.slice(cut),
                bs_us[cut:],
                ts_us[cut:],
                vals[cut:],
            )
            if cut:
                yield _encode_batch(
                    ser.slice(0, cut), bs_us[:cut], ts_us[:cut], vals[:cut]
                )
        if carry is not None and len(carry[1]):
            yield _encode_batch(*carry)

    return arranged.mapInArrow(_gen, BLOCK_SCHEMA)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Encoded blocks -> points (series, ts, value).

    mapInArrow: the per-point series id is an Arrow ``take`` with a
    repeated block index (a C-level gather on the incoming string
    column) — the strings never exist as per-point Python objects,
    which dominated the pandas-based decode."""

    def _decode(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            data = batch.column("data")
            ts_parts, val_parts = [], []
            counts = np.empty(batch.num_rows, dtype=np.int64)
            for i in range(batch.num_rows):
                ts_us, vals = decode_block(data[i].as_py())
                ts_parts.append(ts_us)
                val_parts.append(vals)
                counts[i] = len(ts_us)
            idx = pa.array(np.repeat(np.arange(batch.num_rows), counts))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("series").take(idx),
                    pa.array(np.concatenate(ts_parts), pa.timestamp("us")),
                    pa.array(np.concatenate(val_parts), pa.float64()),
                ],
                ["series", "ts", "value"],
            )

    return blocks.mapInArrow(_decode, POINT_SCHEMA)


def compression_report(blocks: DataFrame) -> DataFrame:
    return blocks.agg(
        F.sum("n_points").alias("points"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        (F.sum("raw_bytes") / F.sum("enc_bytes")).alias("ratio"),
    )
