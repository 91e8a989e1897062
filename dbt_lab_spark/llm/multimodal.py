"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
mapInPandas.

The Spark-side machinery here is REAL and tested: schemas, batch
iteration, partition sizing, and the UDF signatures are exactly what a
production pipeline uses.  The innermost decode step is real too:
`llm/codecs.py` parses BMP, PPM/PGM, PCM WAV and PNG (stdlib-zlib
inflate + filter reconstruction — a genuine compressed codec) from the
public format specs in pure Python/NumPy, so
`extract_features(fake_decode=False)` runs end-to-end on real bytes.
Only codecs whose entropy coding has no stdlib support (JPEG/MP3/...)
remain behind a clearly-marked NotImplementedError; swapping in
PIL/ffmpeg replaces one branch in `codecs.decode_payload` and nothing
else changes.

Scale posture: media bytes never leave their partition (mapInPandas is
a map-only operator); batch size is bounded via
spark.sql.execution.arrow.maxRecordsPerBatch so a partition of large
blobs cannot OOM an executor.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def make_fake_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests: payload bytes derived
    from the asset id (stands in for real media files)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 131 + j * 17 + seed) % 256) for j in range(256 + (i % 7) * 64))
        media = ["image", "audio", "video"][i % 3]
        rows.append((i, media, payload, 64 + i % 32, 48 + i % 16, 1000 * (i % 30)))
    return local_df(spark, rows, ASSET_SCHEMA, fanout=True)


def _decode_image_bytes(payload: bytes, fake: bool) -> list[float]:
    """Innermost decode step.  fake=True keeps the original test seam
    (payload-byte histogram, works on arbitrary bytes); fake=False runs
    the real format-sniffing decoders in llm/codecs.py (BMP/PPM/PGM/WAV
    natively; compressed codecs raise NotImplementedError)."""
    if not fake:
        from dbt_lab_spark.llm.codecs import decode_payload

        return decode_payload(payload)
    # Deterministic fake 'feature': 8-bin byte histogram, normalized.
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    total = float(len(payload)) or 1.0
    return [h / total for h in hist]


def make_real_assets(spark, n: int = 48, seed: int = 42) -> DataFrame:
    """Deterministic asset table whose payloads are REAL encoded media
    bytes — BMP / PPM / PNG / GIF / JPEG (baseline 4:2:0/4:4:4 and
    progressive) / TIFF / PCM-WAV / FLAC (mixed stereo-decorrelation modes),
    all built by llm/codecs.py's spec-implemented encoders — for
    exercising the fake_decode=False path end-to-end."""
    import numpy as np

    from dbt_lab_spark.llm import codecs

    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        kind = i % 8
        if kind == 0:
            w, h = 16 + i % 9, 12 + i % 7  # odd widths exercise BMP row padding
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, "image", codecs.encode_bmp(px), w, h, 0))
        elif kind == 1:
            w, h = 20 + i % 5, 15 + i % 4
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, "image", codecs.encode_ppm(px), w, h, 0))
        elif kind == 2:
            w, h = 12 + i % 6, 10 + i % 5
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, "image", codecs.encode_png(px), w, h, 0))
        elif kind == 3:
            # GIF needs <=256 distinct colors: quantized random palette
            w, h = 14 + i % 5, 11 + i % 4
            px = (rng.integers(0, 8, size=(h, w, 3), dtype=np.uint8) * 32).astype(np.uint8)
            rows.append((i, "image", codecs.encode_gif(px), w, h, 0))
        elif kind == 4:
            w, h = 18 + i % 7, 13 + i % 6  # odd dims exercise MCU padding
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 16 == 4:  # progressive framing in the rotation too
                payload = codecs.encode_jpeg_progressive(px, quality=90)
            else:
                payload = codecs.encode_jpeg(px, quality=90, subsample=i % 2 == 0)
                # plant EXIF on the baseline JPEGs (real camera output
                # carries it; the metadata-extraction stage reads it back)
                payload = codecs.add_exif(
                    payload,
                    codecs.build_exif_app1(
                        make=f"Maker{i % 3}",
                        model=f"Cam-{i}",
                        orientation=1 + i % 8,
                        datetime=f"2026:08:{1 + i % 28:02d} 10:00:00",
                    ),
                )
            rows.append((i, "image", payload, w, h, 0))
        elif kind == 5:
            n_samp = 800 + 16 * (i % 11)
            samples = rng.integers(-(2**15), 2**15, size=n_samp, dtype=np.int16)
            rows.append((i, "audio", codecs.encode_wav(samples, 16000), 0, 0, n_samp * 1000 // 16000))
        elif kind == 6:
            # FLAC: tonal stereo so compression is real; rotate the
            # stereo-decorrelation mode so every decode path runs
            n_samp = 700 + 32 * (i % 7)
            t = np.arange(n_samp)
            left = (5000 * np.sin(t / (20 + i % 9))).astype(np.int16)
            right = (left + rng.integers(-300, 300, n_samp)).astype(np.int16)
            st = np.stack([left, right], axis=1)
            mode = ["indep", "ls", "rs", "ms"][(i // 7) % 4]
            payload = codecs.encode_flac(st, 16000, block_size=512, channel_mode=mode, use_lpc=i % 2 == 0)
            rows.append((i, "audio", payload, 0, 0, n_samp * 1000 // 16000))
        else:
            w, h = 13 + i % 6, 9 + i % 5
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            # rotate every supported TIFF compression through the sweep
            # (r5 adds LZW + Deflate beside r4's PackBits)
            comp = ["none", "packbits", "lzw", "deflate"][(i // 8) % 4]
            rows.append((i, "image", codecs.encode_tiff(px, compression=comp), w, h, 0))
    return local_df(spark, rows, ASSET_SCHEMA, fanout=True)


def extract_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode/feature-extract assets via mapInPandas (Arrow batches).

    Batches arrive as pandas DataFrames; each is processed column-wise
    and yields one output frame — the canonical shape for any
    bytes -> tensor step (image resize, audio frame-sample, ...).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": pdf["payload"].map(
                        lambda p: _decode_image_bytes(p, fake_decode)
                    ),
                }
            )
            yield out

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per sampled
    timestamp (metadata-level; the pixel decode is the stub above).
    Pure Column expressions — the frame index blow-up happens JVM-side
    via sequence+explode, no Python."""
    video = assets.filter(F.col("media_type") == "video")
    return video.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


# ---------------------------------------------------------------------------
# Image transforms (decode -> resize/crop -> re-encode) and audio
# spectral features — the bytes -> tensor -> bytes stages of a training
# pipeline, run as Arrow-batched mapInPandas over real decoded pixels.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),  # re-encoded PPM raster
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _bilinear_resize(img, oh: int, ow: int):
    """Deterministic bilinear resample (half-pixel-center convention,
    edge clamp) of an HxWxC uint8 array to (oh, ow).  Vectorized: two
    gathers + three lerps, no Python pixel loop."""
    import numpy as np

    h, w, _ = img.shape
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    im = img.astype(np.float64)
    top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _center_crop(img, ch: int, cw: int):
    """Center crop (pad-free: callers resize first if smaller)."""
    h, w, _ = img.shape
    y = max(0, (h - ch) // 2)
    x = max(0, (w - cw) // 2)
    return img[y : y + min(ch, h), x : x + min(cw, w)]


def transform_images(
    assets: DataFrame,
    width: int = 24,
    height: int = 24,
    crop: float = 1.0,
) -> DataFrame:
    """Decode image payloads (real codecs: BMP/PPM/PNG/GIF/JPEG/...),
    optionally center-crop to `crop` fraction, bilinear-resize to
    (height, width), and re-encode as PPM — the canonical
    bytes -> tensor -> bytes normalization stage before training.

    Shape: one Arrow mapInPandas (map-only; payloads never cross a
    partition boundary); non-image rows are dropped by a JVM-side
    filter before any Python runs."""

    def _transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from dbt_lab_spark.llm import codecs

        for pdf in batches:
            if not len(pdf):
                continue
            out_rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                fmt = codecs.detect_format(bytes(payload))
                decode = {
                    "bmp": codecs.decode_bmp,
                    "tiff": codecs.decode_tiff,
                    "ppm": codecs.decode_ppm,
                    "pgm": lambda p: np.repeat(
                        codecs.decode_pgm(p)[:, :, None], 3, axis=2
                    ),
                    "png": codecs.decode_png,
                    "gif": codecs.decode_gif,
                    "jpeg": codecs.decode_jpeg,
                }.get(fmt)
                if decode is None:
                    continue  # undecodable format: skip, don't poison the batch
                img = decode(bytes(payload))
                if crop < 1.0:
                    h, w, _ = img.shape
                    img = _center_crop(
                        img, max(1, int(h * crop)), max(1, int(w * crop))
                    )
                resized = _bilinear_resize(img, height, width)
                luma = (
                    299 * resized[:, :, 0].astype(np.int64)
                    + 587 * resized[:, :, 1].astype(np.int64)
                    + 114 * resized[:, :, 2].astype(np.int64)
                ) // 1000
                out_rows.append(
                    (
                        int(aid),
                        width,
                        height,
                        codecs.encode_ppm(resized),
                        float(luma.mean()),
                    )
                )
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["asset_id", "out_w", "out_h", "payload", "mean_luma"],
                )

    images = assets.filter(F.col("media_type") == "image").select("asset_id", "payload")
    return images.mapInPandas(_transform, RESIZED_SCHEMA)


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("band_energy", T.ArrayType(T.DoubleType())),
    ]
)


def audio_spectral_features(
    assets: DataFrame, n_fft: int = 256, hop: int = 128, bands: int = 8
) -> DataFrame:
    """STFT band-energy features for audio payloads: decode PCM WAV or
    FLAC, frame with a Hann window, rfft each frame (NumPy), pool |X|^2 into
    `bands` equal frequency bands, normalize to sum 1 — a deterministic
    stand-in for any mel-scale frontend, with the identical Spark
    plumbing (map-only Arrow batches, no shuffle)."""

    def _spectral(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from dbt_lab_spark.llm import codecs

        win = None
        for pdf in batches:
            if not len(pdf):
                continue
            out_rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                fmt = codecs.detect_format(bytes(payload))
                if fmt == "wav":
                    _, samples = codecs.decode_wav(bytes(payload))
                elif fmt == "flac":
                    _, samples = codecs.decode_flac(bytes(payload))
                else:
                    continue
                mono = samples.astype(np.float64).mean(axis=1)
                n = (len(mono) - n_fft) // hop + 1
                if n <= 0:
                    continue
                if win is None:
                    win = np.hanning(n_fft)
                idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
                frames = mono[idx] * win
                power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                nbins = power.shape[1]
                edges = np.linspace(0, nbins, bands + 1).astype(np.int64)
                energy = np.array(
                    [power[:, edges[b] : edges[b + 1]].sum() for b in range(bands)]
                )
                total = energy.sum() or 1.0
                out_rows.append((int(aid), int(n), (energy / total).tolist()))
            if out_rows:
                yield pd.DataFrame(
                    out_rows, columns=["asset_id", "n_frames", "band_energy"]
                )

    audio = assets.filter(F.col("media_type") == "audio").select("asset_id", "payload")
    return audio.mapInPandas(_spectral, SPECTRAL_SCHEMA)


EXIF_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("datetime", T.StringType()),
    ]
)


def extract_exif(assets: DataFrame) -> DataFrame:
    """Ingest-time metadata extraction: sniff format, parse the EXIF
    APP1/TIFF structure out of JPEG payloads (no pixel decode — this
    reads a few hundred header bytes per asset, the cheap pass a real
    pipeline runs BEFORE deciding what to decode).  Map-only Arrow
    batches; non-JPEG and EXIF-less assets yield nulls."""

    def _exif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dbt_lab_spark.llm import codecs

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                fmt = codecs.detect_format(data)
                meta = {}
                if fmt == "jpeg":
                    meta = codecs.parse_exif(data)
                rows.append(
                    (
                        int(aid),
                        fmt,
                        meta.get("make"),
                        meta.get("model"),
                        meta.get("orientation"),
                        meta.get("datetime"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "format", "make", "model", "orientation", "datetime"],
            )

    return assets.select("asset_id", "payload").mapInPandas(_exif, EXIF_SCHEMA)


def make_video_assets(spark, n: int = 12, seed: int = 42) -> DataFrame:
    """Deterministic MJPEG 'video' asset table: each payload is a real
    concatenated-JPEG stream (4-9 frames, varying sizes)."""
    import numpy as np

    from dbt_lab_spark.llm import codecs

    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        n_frames = 4 + i % 6
        w, h = 16 + i % 5, 12 + i % 4
        frames = [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        payload = codecs.encode_mjpeg(frames, quality=90)
        rows.append((i, "video", payload, w, h, n_frames * 40))
    return local_df(spark, rows, ASSET_SCHEMA, fanout=True)


FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def sample_video_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: MJPEG payloads split at their
    SOI/EOI boundaries with only every n-th frame entropy-decoded (the
    whole economics of frame sampling); animated GIF payloads decode
    their frame sequence and sample it.  Map-only Arrow stage."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dbt_lab_spark.llm import codecs

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                fmt = codecs.detect_format(data)
                if fmt == "gif":
                    gif_frames = codecs.decode_gif_frames(data)
                    for idx in range(0, len(gif_frames), every_n):
                        feat = codecs.image_feature(gif_frames[idx])
                        rows.append((int(aid), idx, len(gif_frames), feat))
                    continue
                if fmt == "avi":
                    parts = codecs.decode_avi_mjpeg(data)
                else:
                    parts = codecs.split_mjpeg(data)
                for idx in range(0, len(parts), every_n):
                    feat = codecs.image_feature(codecs.decode_jpeg(parts[idx]))
                    rows.append((int(aid), idx, len(parts), feat))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "n_frames", "feature"]
            )

    video = assets.filter(F.col("media_type") == "video").select("asset_id", "payload")
    return video.mapInPandas(_sample, FRAME_FEATURE_SCHEMA)
