"""Pins for llm/cdc.py (Gear content-defined chunking)."""

import hashlib

import numpy as np
import pytest

from dbt_lab_spark.llm.cdc import chunk_dedup_stats, chunk_payloads, gear_boundaries


def _chunk_hashes(data, avg_bits=10):
    out, start = [], 0
    for cut in gear_boundaries(data, avg_bits):
        out.append(hashlib.md5(data[start:cut]).hexdigest())
        start = cut
    return out


def _random_bytes(n, seed=7):
    return bytes(np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8))


def test_boundaries_cover_payload_within_bounds():
    data = _random_bytes(150_000)
    cuts = gear_boundaries(data, avg_bits=10, min_size=64, max_size=8192)
    lens = np.diff([0] + cuts)
    assert cuts[-1] == len(data)
    assert all(l <= 8192 for l in lens)
    assert all(l >= 64 for l in lens[:-1])  # last chunk may be short
    # average near the 2^10 target (min-size skew tolerated)
    assert 700 < lens.mean() < 2200


def test_insertion_disturbs_only_local_chunks():
    data = _random_bytes(120_000, seed=3)
    base = _chunk_hashes(data)
    edited = data[:60_000] + b"INSERTED" + data[60_000:]
    after = _chunk_hashes(edited)
    assert len(set(base) & set(after)) >= len(base) - 4


def test_deletion_resyncs():
    data = _random_bytes(120_000, seed=5)
    base = _chunk_hashes(data)
    after = _chunk_hashes(data[:40_000] + data[40_200:])
    assert len(set(base) & set(after)) >= len(base) - 4


def test_fixed_size_blocks_would_not_resync():
    """The property CDC buys: fixed blocks lose ALL alignment after an
    insertion; gear chunks keep nearly everything."""
    data = _random_bytes(100_000, seed=9)
    edited = data[:100] + b"X" + data[100:]
    fixed = lambda d: [
        hashlib.md5(d[i : i + 1024]).hexdigest() for i in range(0, len(d), 1024)
    ]
    assert len(set(fixed(data)) & set(fixed(edited))) <= 1
    assert len(set(_chunk_hashes(data)) & set(_chunk_hashes(edited))) >= (
        len(_chunk_hashes(data)) - 4
    )


def test_empty_and_tiny_payloads():
    assert gear_boundaries(b"") == []
    assert gear_boundaries(b"abc", avg_bits=6, min_size=16) == [3]


def test_chunk_payloads_spark_and_dedup_stats(spark):
    shared = _random_bytes(5000, seed=11)
    a = _random_bytes(3000, seed=12) + shared
    b = shared + _random_bytes(2500, seed=13)
    df = spark.createDataFrame([(1, a), (2, b), (3, a)], "doc_id long, payload binary")
    chunks = chunk_payloads(df, avg_bits=8, min_size=32)
    rows = chunks.collect()
    # reconstruction: offsets/lengths tile each payload exactly
    for did, payload in ((1, a), (2, b), (3, a)):
        mine = sorted(
            (r["offset"], r["length"], r["chunk_md5"]) for r in rows if r["doc_id"] == did
        )
        assert mine[0][0] == 0
        assert sum(m[1] for m in mine) == len(payload)
        for off, ln, h in mine:
            assert hashlib.md5(payload[off : off + ln]).hexdigest() == h
    stats = chunk_dedup_stats(chunks).first()
    assert stats["n_chunks"] > stats["n_unique_chunks"]  # doc3 == doc1, shared middle
    assert stats["unique_bytes"] < stats["total_bytes"]
    # doc 3 duplicates doc 1 entirely: dedup ratio at least doc1's share
    assert stats["dedup_ratio"] > len(a) / (2 * len(a) + len(b)) * 0.8
