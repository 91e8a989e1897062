"""Content-based AUDIO near-duplicate detection: spectrogram-gradient
fingerprints + hamming-band LSH + connected components — completing the
per-modality dedup matrix (text: 5 planes, embeddings: 2, images:
llm/imagededup.py; this is the audio plane).

Fingerprint construction (public Chromaprint/"Shazam constellation"
family, reduced to a deterministic 64-bit plane): decode PCM WAV / FLAC
/ G.711 -> Hann STFT -> pool |X|^2 into an 8x9 (time x frequency)
log-energy grid -> bit (t*8+b) = E[t,b] > E[t,b+1] — the same
gradient-sign idea as image dHash, applied to the spectrogram.  Energy-
gradient signs are invariant to uniform gain and robust to additive
noise well below the signal floor, which is what makes them a usable
near-dup key for re-encoded / re-leveled audio.

Pipeline shape (100 TB posture) is identical to the image plane:
  1. `audio_fingerprints` — ONE Arrow mapInPandas stage (map-only;
     samples never cross a partition boundary; one bigint out per clip).
  2. `hamming_dedup_pairs` (llm/dedup.py) — pigeonhole banding, per-band
     equi-joins, never all-pairs; exact bit_count verify.
  3. `connected_components` (llm/dedup.py) — pairs -> dedup clusters.

Reference parity: beyond-reference (rimarin/dbt-lab has no multimodal
surface); north-star brief capability.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FP_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("afp", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("samplerate", T.IntegerType()),
    ]
)

_N_FFT = 256
_HOP = 128
_T_BLOCKS = 8
_F_BANDS = 9  # 9 bands -> 8 adjacent-pair gradient bits per time block


def audio_fingerprint64(mono, samplerate: int) -> int:
    """64-bit spectrogram-gradient fingerprint of a mono float signal.

    Hann STFT (256/128) -> |X|^2 pooled into an 8x9 time x frequency
    grid -> log energies -> bit (t*8+b) = E[t,b] > E[t,b+1].  Gain
    invariant (log shift cancels in the comparison); samplerate is part
    of the key space (different rates bin differently), so compare
    fingerprints within a samplerate or resample first.
    """
    import numpy as np

    x = mono.astype(np.float64)
    n = (len(x) - _N_FFT) // _HOP + 1
    if n < _T_BLOCKS:
        raise ValueError(
            f"audio_fingerprint64 needs >= {_T_BLOCKS} STFT frames "
            f"({_N_FFT}+{_HOP}*{_T_BLOCKS - 1} samples); got {len(x)}"
        )
    win = np.hanning(_N_FFT)
    idx = np.arange(_N_FFT)[None, :] + _HOP * np.arange(n)[:, None]
    power = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    tb = np.linspace(0, n, _T_BLOCKS + 1).astype(np.int64)
    fb = np.linspace(0, power.shape[1], _F_BANDS + 1).astype(np.int64)
    grid = np.empty((_T_BLOCKS, _F_BANDS))
    for t in range(_T_BLOCKS):
        seg = power[tb[t] : tb[t + 1]]
        for b in range(_F_BANDS):
            grid[t, b] = seg[:, fb[b] : fb[b + 1]].sum()
    grid = np.log(grid + 1e-30)
    bits = grid[:, :-1] > grid[:, 1:]  # (8, 8) gradient signs
    v = 0
    for i, bit in enumerate(bits.flatten()):
        if bit:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def audio_fingerprints(assets: DataFrame) -> DataFrame:
    """(asset_id, afp, n_samples, samplerate) per decodable audio clip —
    one Arrow mapInPandas stage; non-audio and undecodable rows drop
    (JVM-side media_type filter first)."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from dbt_lab_spark.llm import codecs

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                fmt = codecs.detect_format(raw)
                try:
                    if fmt == "wav":
                        sr, samples = codecs.decode_wav(raw)
                    elif fmt == "flac":
                        sr, samples = codecs.decode_flac(raw)
                    else:
                        continue
                    mono = samples.astype(np.float64).mean(axis=1)
                    fp = audio_fingerprint64(mono, sr)
                except Exception:
                    continue  # corrupt/short payload: skip, don't poison
                rows.append((int(aid), fp, int(len(mono)), int(sr)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["asset_id", "afp", "n_samples", "samplerate"]
                )

    audio = assets.filter(F.col("media_type") == "audio").select(
        "asset_id", "payload"
    )
    return audio.mapInPandas(_fp, FP_SCHEMA)


def audio_dedup_pairs(assets: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate audio pairs (id_a, id_b, hamming) via the
    fingerprint plane + hamming-band LSH (pigeonhole, recall 1.0 by
    construction) — per-band equi-joins, never all-pairs."""
    from dbt_lab_spark.llm.dedup import hamming_dedup_pairs

    # localCheckpoint: decode+fingerprint once, not once per band side
    # of hamming_dedup_pairs (same rationale as image_dedup_pairs).
    fps = audio_fingerprints(assets).select("asset_id", "afp").localCheckpoint()
    return hamming_dedup_pairs(
        fps, hash_col="afp", id_col="asset_id", max_hamming=max_hamming
    )


def audio_dup_clusters(assets: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(asset_id, component) dedup clusters over fingerprint pairs via
    min-label connected components."""
    from dbt_lab_spark.llm.dedup import connected_components

    pairs = audio_dedup_pairs(assets, max_hamming=max_hamming)
    cc = connected_components(pairs, id_a="id_a", id_b="id_b")
    return cc.select(F.col("id").alias("asset_id"), "component")


def make_near_dup_audio(
    spark: SparkSession,
    n_groups: int = 20,
    variants: int = 3,
    seed: int = 7,
    samplerate: int = 8000,
    n_samples: int = 2048,
) -> DataFrame:
    """Planted near-dup audio corpus: `n_groups` base clips — each a sum
    of three group-specific sine tones over a seeded pseudo-noise floor
    (the floor keeps empty-band energy gradients deterministic, so the
    2%-amplitude perturbation below can't flip near-tie bits) — with
    `variants` variants per group: v0 the base, v1 a 0.82x gain change
    (gradient signs exactly invariant), v2 the base plus low-level
    seeded white noise.  PCM-WAV encoded (lossless).  asset_id =
    group*variants + v, so cluster structure is closed-form — the same
    planting contract as llm/imagededup.make_near_dup_images."""
    import numpy as np

    from dbt_lab_spark.llm import codecs

    rows = []
    t = np.arange(n_samples)
    for g in range(n_groups):
        rng = np.random.default_rng(seed + g)
        freqs = rng.choice(np.arange(8, 120), size=3, replace=False) * (
            samplerate / 256.0
        )  # on-bin tones for clean band placement
        amps = 0.25 + 0.15 * rng.random(3)
        base = sum(
            a * np.sin(2 * np.pi * f * t / samplerate)
            for a, f in zip(amps, freqs)
        )
        base = base + 0.05 * rng.standard_normal(n_samples)  # seeded PN floor
        for v in range(variants):
            x = base
            if v == 1:
                x = 0.82 * base
            elif v >= 2:
                vrng = np.random.default_rng(seed * 1000 + g * variants + v)
                x = base + 0.004 * vrng.standard_normal(n_samples)
            pcm = np.clip(x * 20000, -32768, 32767).astype(np.int16)
            payload = codecs.encode_wav(pcm[:, None], sample_rate=samplerate)
            rows.append(
                (
                    g * variants + v,
                    "audio",
                    payload,
                    0,
                    0,
                    int(n_samples * 1000 / samplerate),
                )
            )
    from dbt_lab_spark.llm.multimodal import ASSET_SCHEMA

    return local_df(spark, rows, ASSET_SCHEMA, fanout=True)
