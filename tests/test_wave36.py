"""Round-7 pins, part 2: arithmetic-coded JPEG (T.81 Annex D QM-coder
+ SOF9 sequential DCT) — the last stubbed codec path (VERDICT r6 #7).

Pin strategy mirrors the other spec-implemented codecs: property-fuzz
the entropy layer in isolation, round-trip full images through the
public encode/decode pair, pin the coding-efficiency property that
distinguishes a REAL QM coder from a merely self-consistent one, and
keep the unsupported variants refusing loudly."""

from __future__ import annotations

import numpy as np
import pytest

from dbt_lab_spark.llm.codecs import (
    _QMDecoder,
    _QMEncoder,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_arith,
)


def _test_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            xx * 255.0 / max(w - 1, 1),
            yy * 255.0 / max(h - 1, 1),
            (xx + yy) * 127.0 / max(h + w - 2, 1) + 64,
        ],
        axis=2,
    )
    return np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)


class TestQMCoder:
    def test_roundtrip_fuzz(self):
        rng = np.random.default_rng(7)
        for _ in range(15):
            n = int(rng.integers(1, 4000))
            nctx = int(rng.integers(1, 16))
            biases = rng.uniform(0.01, 0.99, nctx)
            ctxs = rng.integers(0, nctx, n)
            bits = (rng.random(n) < biases[ctxs]).astype(int)
            enc = _QMEncoder()
            st_e = bytearray(nctx)
            for c, b in zip(ctxs, bits):
                enc.encode(st_e, int(c), int(b))
            payload = enc.flush() + b"\xff\xd9"
            dec = _QMDecoder(payload, 0)
            st_d = bytearray(nctx)
            assert [dec.decode(st_d, int(c)) for c in ctxs] == list(bits)

    def test_coding_efficiency_near_entropy(self):
        # the estimation state machine must ADAPT: a wrong transition
        # table still round-trips (both sides share it) but cannot
        # approach the source entropy — this is the pin that catches a
        # corrupted Table D.3
        rng = np.random.default_rng(1)
        n = 60000
        for p, h_src in ((0.9, 0.469), (0.99, 0.081)):
            bits = (rng.random(n) < p).astype(int)
            enc = _QMEncoder()
            st = bytearray(1)
            for b in bits:
                enc.encode(st, 0, int(b))
            bps = len(enc.flush()) * 8 / n
            assert bps < h_src * 1.25 + 0.01, (p, bps, h_src)

    def test_stuffed_ff_bytes_survive(self):
        # drive the coder long enough that 0xFF data bytes and carries
        # occur; the stream must still terminate and round-trip
        rng = np.random.default_rng(3)
        n = 20000
        ctxs = rng.integers(0, 4, n)
        bits = rng.integers(0, 2, n)
        enc = _QMEncoder()
        st_e = bytearray(4)
        for c, b in zip(ctxs, bits):
            enc.encode(st_e, int(c), int(b))
        payload = enc.flush()
        assert b"\xff" in payload  # the scenario actually exercised
        dec = _QMDecoder(payload + b"\xff\xd9", 0)
        st_d = bytearray(4)
        assert [dec.decode(st_d, int(c)) for c in ctxs] == list(bits)


class TestArithJpeg:
    def test_roundtrip_rmse(self):
        for shape in [(32, 32), (17, 23), (8, 8), (48, 64)]:
            img = _test_image(*shape, seed=shape[0])
            dec = decode_jpeg(encode_jpeg_arith(img, quality=90))
            assert dec.shape == img.shape
            rmse = float(
                np.sqrt(np.mean((dec.astype(float) - img.astype(float)) ** 2))
            )
            assert rmse < 10.0, (shape, rmse)

    def test_entropy_stage_is_lossless(self):
        # arithmetic and Huffman share the DCT/quant pipeline, so the
        # decoded pixels must be IDENTICAL — any difference means the
        # entropy layer corrupted a coefficient
        img = _test_image(40, 56, seed=9)
        da = decode_jpeg(encode_jpeg_arith(img, quality=85))
        dh = decode_jpeg(encode_jpeg(img, quality=85))
        assert np.array_equal(da, dh)

    def test_compresses_better_than_huffman(self):
        img = _test_image(64, 64, seed=2)
        pa = encode_jpeg_arith(img, quality=90)
        ph = encode_jpeg(img, quality=90)
        assert len(pa) < len(ph)

    def test_flat_image_tiny_payload(self):
        img = np.full((32, 32, 3), 130, dtype=np.uint8)
        payload = encode_jpeg_arith(img, quality=90)
        dec = decode_jpeg(payload)
        assert np.all(np.abs(dec.astype(int) - 130) <= 3)
        assert len(payload) < 450  # headers dominate: entropy ~0

    def test_progressive_arithmetic_refused(self):
        # patch SOF9 -> SOF10 (0xCA, arithmetic progressive): the
        # decoder must refuse loudly, not mis-decode
        img = _test_image(16, 16, seed=4)
        payload = bytearray(encode_jpeg_arith(img))
        idx = payload.find(b"\xff\xc9")
        assert idx > 0
        payload[idx + 1] = 0xCA
        with pytest.raises(NotImplementedError, match="0xFFCA"):
            decode_jpeg(bytes(payload))

    def test_dac_segment_parsed(self):
        # the emitted DAC declares DC (L=0, U=1) and AC Kx=5; mangle
        # the AC Kx to an extreme value and the stream must now
        # MISdecode relative to the clean payload (proving the decoder
        # honors DAC rather than hard-coding defaults) — or refuse.
        img = _test_image(24, 24, seed=5)
        payload = bytearray(encode_jpeg_arith(img))
        clean = decode_jpeg(bytes(payload))
        idx = payload.find(b"\xff\xcc")
        assert idx > 0
        # DAC body: [00 10 01 10 10 05 11 05]; last byte = Kx for AC
        # table 1 -> set to 63
        assert payload[idx + 4 + 7] == 5
        payload[idx + 4 + 7] = 63
        try:
            mangled = decode_jpeg(bytes(payload))
            assert not np.array_equal(mangled, clean)
        except (ValueError, NotImplementedError):
            pass  # refusing a now-inconsistent stream is also honest

    def test_multimodal_dispatch_handles_sof9(self):
        # the corpus decode path (detect_format -> decode_payload) must
        # route an arithmetic JPEG like any other: magic bytes are the
        # same FFD8, only the SOF marker differs
        from dbt_lab_spark.llm.codecs import decode_payload, detect_format

        img = _test_image(24, 24, seed=11)
        payload = encode_jpeg_arith(img, quality=90)
        assert detect_format(payload) == "jpeg"
        feat = decode_payload(payload)
        assert feat is not None
