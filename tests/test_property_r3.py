"""Property tests (Hypothesis) for the r3-late byte-level surface:
FLAC, ustar, WARC, Gear-CDC, EXIF/ID3.  Round-trip identity must hold
for ARBITRARY inputs, not just the pin fixtures."""

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_lab_spark.llm import codecs
from dbt_lab_spark.llm.cdc import gear_boundaries
from dbt_lab_spark.sources import tar_bytes, untar_bytes, warc_record_bytes


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(st.integers(-(2**15), 2**15 - 1), min_size=1, max_size=3000),
    stereo=st.booleans(),
    mode=st.sampled_from(["indep", "ls", "rs", "ms", "auto"]),
    lpc=st.booleans(),
    block=st.sampled_from([256, 1000, 4096]),
)
def test_flac_round_trip_property(data, stereo, mode, lpc, block):
    arr = np.array(data, dtype=np.int16)
    if stereo:
        arr = np.stack([arr, arr[::-1]], axis=1)
    elif mode != "indep":
        mode = "auto"  # stereo modes need 2 channels
    payload = codecs.encode_flac(arr, 16000, block_size=block, channel_mode=mode, use_lpc=lpc)
    rate, out = codecs.decode_flac(payload)
    want = arr if arr.ndim == 2 else arr[:, None]
    assert rate == 16000
    assert np.array_equal(out, want)


@settings(max_examples=30, deadline=None)
@given(
    members=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=48, max_codepoint=122),
                min_size=1,
                max_size=40,
            ),
            st.binary(max_size=2000),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda m: m[0],
    )
)
def test_tar_round_trip_property(members):
    blob = tar_bytes(members)
    assert untar_bytes(blob) == members
    assert len(blob) % 512 == 0


@settings(max_examples=30, deadline=None)
@given(
    payloads=st.lists(st.binary(max_size=3000), min_size=1, max_size=6),
)
def test_warc_frame_scan_property(payloads):
    blob = b"".join(
        warc_record_bytes("response", f"https://x/{i}", p)
        for i, p in enumerate(payloads)
    )
    # re-scan the concatenated records with the same linear algorithm
    # the Spark parser uses
    pos, got = 0, []
    while pos < len(blob):
        hdr_end = blob.index(b"\r\n\r\n", pos)
        headers = dict(
            line.split(": ", 1)
            for line in blob[pos:hdr_end].decode().split("\r\n")[1:]
        )
        clen = int(headers["Content-Length"])
        got.append(blob[hdr_end + 4 : hdr_end + 4 + clen])
        pos = hdr_end + 4 + clen + 4
    assert got == payloads


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=50_000))
def test_cdc_boundaries_property(data):
    cuts = gear_boundaries(data, avg_bits=8, min_size=32, max_size=2048)
    if not data:
        assert cuts == []
        return
    assert cuts[-1] == len(data)
    lens = np.diff([0] + cuts)
    assert (lens > 0).all()
    assert (lens <= 2048).all()
    assert (lens[:-1] >= 32).all() or len(lens) == 1
    # deterministic
    assert gear_boundaries(data, avg_bits=8, min_size=32, max_size=2048) == cuts


@settings(max_examples=25, deadline=None)
@given(
    make=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20),
    model=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30),
    orient=st.integers(1, 8),
)
def test_exif_property(make, model, orient):
    jpeg = codecs.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=90)
    app1 = codecs.build_exif_app1(make=make, model=model, orientation=orient)
    meta = codecs.parse_exif(codecs.add_exif(jpeg, app1))
    want = {"orientation": orient}
    if make:
        want["make"] = make
    if model:
        want["model"] = model
    assert meta == want


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    gray=st.booleans(),
    seed=st.integers(0, 1000),
)
def test_tiff_round_trip_property(h, w, gray, seed):
    rng = np.random.default_rng(seed)
    if gray:
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        out = codecs.decode_tiff(codecs.encode_tiff(px))
        assert np.array_equal(out[:, :, 0], px)
    else:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_tiff(codecs.encode_tiff(px)), px)


@settings(max_examples=15, deadline=None)
@given(
    n_frames=st.integers(1, 5),
    h=st.integers(8, 16),
    w=st.integers(8, 16),
    seed=st.integers(0, 500),
)
def test_avi_container_property(n_frames, h, w, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
    avi = codecs.encode_avi_mjpeg(frames)
    parts = codecs.decode_avi_mjpeg(avi)
    assert len(parts) == n_frames
    for p, f in zip(parts, frames):
        assert p == codecs.encode_jpeg(f, quality=90)  # byte-exact container


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(st.integers(-(2**15), 2**15 - 1), min_size=1, max_size=2000),
    law=st.sampled_from(["u", "a"]),
)
def test_g711_wav_property(data, law):
    s = np.array(data, dtype=np.int16)
    rate, out = codecs.decode_wav(codecs.encode_wav_g711(s, 8000, law=law))
    assert rate == 8000 and out.shape == (len(s), 1)
    err = np.abs(out[:, 0].astype(np.int32) - s.astype(np.int32))
    rel = err / np.maximum(np.abs(s.astype(np.int32)), 256)
    assert rel.max() <= 0.07
