"""Content-defined chunking (Gear hash) for byte-level dedup.

The storage-dedup algorithm (Gear-CDC, the FastCDC family): chunk
boundaries are decided by a 64-byte rolling fingerprint, so inserting
or deleting bytes only disturbs chunks near the edit — unlike
fixed-size blocks, where one inserted byte shifts every later
boundary.  Chunk-hash equality then finds byte-identical regions
ACROSS payloads (near-duplicate documents, re-encoded containers,
partially-updated files) without any alignment step.

Spark posture: chunking is one Arrow mapInPandas stage (payload-local,
no shuffle); cross-corpus dedup is a hash-aggregate on chunk md5 — the
exact-dedup shape that scales.  The Gear stage is vectorized: the
window hash h_i = sum_{k<64} GEAR[b_{i-k}] << k is computed with 64
shifted vector adds (mod 2^64 drops older bytes), then min/max bounds
are enforced over the few candidate cut points sequentially.

Determinism: the 256-entry GEAR table is generated from a fixed seed
once at import; boundaries depend only on content.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_GEAR = np.random.default_rng(0xCDC).integers(
    0, 1 << 64, size=256, dtype=np.uint64
)


def gear_boundaries(
    data: bytes, avg_bits: int = 10, min_size: int = 64, max_size: int | None = None
) -> list[int]:
    """Cut points for one payload (end offsets, last == len(data)).
    Average chunk length ~2^avg_bits; bounds enforced."""
    n = len(data)
    if n == 0:
        return []
    if max_size is None:
        max_size = 8 << avg_bits
    # FastCDC-style HIGH-bits mask: the low bits of the gear hash are
    # driven only by the most recent couple of bytes (g << 0, g << 1,
    # ...), so judging them gives a degenerate window; the top bits mix
    # the whole 64-byte window via shifts and carries
    mask = np.uint64(((1 << avg_bits) - 1) << (64 - avg_bits))
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(64, n)):
        h[k:] += g[: n - k] << np.uint64(k)
    cand = np.nonzero((h & mask) == 0)[0] + 1  # cut AFTER the matching byte
    cuts = []
    start = 0
    ci = 0
    while start < n:
        # first candidate satisfying the min bound for this chunk
        ci = int(np.searchsorted(cand, start + min_size))
        cut = int(cand[ci]) if ci < len(cand) else n
        cut = min(cut, start + max_size, n)
        cuts.append(cut)
        start = cut
    return cuts


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)


def chunk_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    avg_bits: int = 10,
    min_size: int = 64,
    max_size: int | None = None,
) -> DataFrame:
    """One row per content-defined chunk: (doc_id, chunk_idx, offset,
    length, chunk_md5).  Map-only Arrow stage, no shuffle."""

    def _chunk(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                start = 0
                for i, cut in enumerate(
                    gear_boundaries(data, avg_bits, min_size, max_size)
                ):
                    rows.append(
                        (
                            int(did),
                            i,
                            start,
                            cut - start,
                            hashlib.md5(data[start:cut]).hexdigest(),
                        )
                    )
                    start = cut
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "offset", "length", "chunk_md5"]
            )

    return df.select(id_col, payload_col).mapInPandas(_chunk, CHUNK_SCHEMA)


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus-level chunk dedup summary: the byte savings chunk-level
    dedup would realize.  One hash-aggregate on chunk_md5."""
    from pyspark.sql import functions as F

    per_hash = chunks.groupBy("chunk_md5").agg(
        F.count("*").alias("copies"), F.first("length").alias("length")
    )
    return per_hash.agg(
        F.count("*").alias("n_unique_chunks"),
        F.sum("copies").alias("n_chunks"),
        F.sum(F.col("copies") * F.col("length")).alias("total_bytes"),
        F.sum("length").alias("unique_bytes"),
        (
            1.0
            - F.sum("length") / F.sum(F.col("copies") * F.col("length"))
        ).alias("dedup_ratio"),
    )
