"""r5 image perceptual-hash dedup pins (VERDICT r4 #2): deterministic
hash values, planted-corpus hamming margins, pigeonhole banding
completeness, and the end-to-end cluster structure."""

from __future__ import annotations

import numpy as np


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _planted_hashes():
    from dbt_lab_spark.llm import codecs
    from dbt_lab_spark.llm.imagededup import dhash64, phash64

    seed, size, variants = 42, 32, 3
    hd, hp = {}, {}
    for g in range(20):
        rng = np.random.default_rng(seed + g)
        base = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        for v in range(variants):
            img = base
            if v == 1:
                img = np.clip(base.astype(np.int64) + 6, 0, 255).astype(np.uint8)
            elif v >= 2:
                noisy = base.copy()
                vrng = np.random.default_rng(seed * 1000 + g * variants + v)
                n_flip = max(1, (size * size) // 50)
                ys = vrng.integers(0, size, n_flip)
                xs = vrng.integers(0, size, n_flip)
                noisy[ys, xs] = vrng.integers(0, 256, size=(n_flip, 3))
                img = noisy
            dec = codecs.decode_png(codecs.encode_png(img))
            hd[g * variants + v] = dhash64(dec)
            hp[g * variants + v] = phash64(dec)
    return hd, hp


def test_perceptual_hash_properties():
    """dHash invariances that make it a near-dup key: exact under
    identity, unchanged by a global +6 brightness shift away from clip,
    ~half the bits flip between independent random images."""
    from dbt_lab_spark.llm.imagededup import dhash64, phash64

    rng = np.random.default_rng(7)
    # keep pixels < 250 so +6 never clips: gradient signs are preserved
    img = rng.integers(0, 250, size=(40, 40, 3), dtype=np.uint8)
    assert dhash64(img) == dhash64(img.copy())
    bright = np.clip(img.astype(np.int64) + 6, 0, 255).astype(np.uint8)
    assert _ham(dhash64(img), dhash64(bright)) == 0
    other = np.random.default_rng(8).integers(0, 250, size=(40, 40, 3), dtype=np.uint8)
    assert 15 <= _ham(dhash64(img), dhash64(other)) <= 49
    assert 15 <= _ham(phash64(img), phash64(other)) <= 49


def test_planted_corpus_margins():
    """The planted corpus must separate cleanly at the query
    thresholds: within-group dhash <= 4 << 6 < 19 <= cross-group;
    phash within <= 8 <= 10 < 20 <= cross (the thresholds
    workload_r5 uses).  A codec or resize change that shifts hashes
    breaks this pin before it breaks the oracle."""
    hd, hp = _planted_hashes()
    ids = sorted(hd)
    wd, wp, cd, cp = [], [], [], []
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            (wd if i // 3 == j // 3 else cd).append(_ham(hd[i], hd[j]))
            (wp if i // 3 == j // 3 else cp).append(_ham(hp[i], hp[j]))
    assert len(wd) == 60
    assert max(wd) <= 4 and min(cd) >= 19
    assert max(wp) <= 8 and min(cp) >= 20


def test_hamming_banding_is_lossless(spark):
    """Pigeonhole completeness of hamming_dedup_pairs: on the planted
    hash set, the banded pairs EQUAL the exact all-pairs <= h set (the
    recall-1.0 theorem, checked concretely)."""
    from dbt_lab_spark.llm.dedup import hamming_dedup_pairs

    hd, _ = _planted_hashes()
    rows = [(i, h) for i, h in hd.items()]
    df = spark.createDataFrame(rows, "asset_id long, dhash long")
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_dedup_pairs(
            df, hash_col="dhash", id_col="asset_id", max_hamming=6
        ).collect()
    }
    exact = {
        (i, j): _ham(hd[i], hd[j])
        for i in hd
        for j in hd
        if i < j and _ham(hd[i], hd[j]) <= 6
    }
    assert banded == exact
    assert len(exact) == 60  # exactly the planted within-group pairs


def test_image_dedup_end_to_end(spark):
    """Full pipeline on the planted corpus: decode -> dhash -> banding
    -> connected components recovers exactly the 20 planted groups
    (component = min id = group*3, 3 members each)."""
    from dbt_lab_spark.llm.imagededup import image_dup_clusters, make_near_dup_images

    assets = make_near_dup_images(spark, n_groups=20, variants=3, seed=42)
    got = {
        r["asset_id"]: r["component"]
        for r in image_dup_clusters(assets, max_hamming=6).collect()
    }
    assert got == {i: (i // 3) * 3 for i in range(60)}


def test_image_hashes_skips_undecodable(spark):
    """Corrupt payloads and non-image rows are dropped, not fatal."""
    from dbt_lab_spark.llm import codecs
    from dbt_lab_spark.llm.imagededup import image_hashes

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    rows = [
        (0, "image", bytearray(codecs.encode_png(img)), 12, 10, 0),
        (1, "image", bytearray(b"\x89PNG\r\n\x1a\nGARBAGE"), 0, 0, 0),
        (2, "audio", bytearray(b"RIFFxxxx"), 0, 0, 100),
    ]
    from dbt_lab_spark.llm.multimodal import ASSET_SCHEMA

    out = image_hashes(spark.createDataFrame(rows, ASSET_SCHEMA)).collect()
    assert [r["asset_id"] for r in out] == [0]
    assert out[0]["width"] == 12 and out[0]["height"] == 10
