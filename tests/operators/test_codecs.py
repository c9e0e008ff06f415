"""Pure-stdlib media codecs (operators/codecs.py): PNG/BMP/WAV encode
and decode with no native libs. These run without Spark — the Spark
plumbing over them is covered by test_multimodal_real.py and the
battery entries.

Contract under test: byte-exact round trips (encode -> decode) across
every PNG filter type and channel layout, BMP row padding and both row
orders, WAV PCM frames, format sniffing, and the format-accurate
NotImplementedError boundary (JPEG/MP4 only).
"""

import struct
import zlib

import pytest

from factstore_spark.operators.codecs import (
    bmp_decode,
    bmp_encode,
    decode_media,
    png_decode,
    png_encode,
    sniff_format,
    wav_decode,
    wav_encode,
)


def _pix(n: int, seed: int = 0) -> bytes:
    return bytes((seed + i) % 251 for i in range(n))


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 16), (31, 7), (2, 40)])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip_all_filters(w, h, channels):
    """filter_mode='cycle' files every row with row%5 — a decoder that
    mis-inverts ANY of the five filters fails byte-exactness here."""
    px = _pix(w * h * channels, seed=w * 7 + h)
    data = png_encode(px, w, h, channels=channels, filter_mode="cycle")
    d = png_decode(data)
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
    assert d["pixels"] == px


def test_png_filter_none_mode():
    px = _pix(12 * 5 * 3)
    d = png_decode(png_encode(px, 12, 5, filter_mode="none"))
    assert d["pixels"] == px


def test_png_palette_decode():
    """Hand-built color-type-3 PNG: the decoder expands PLTE."""
    w, h = 4, 3
    plte = bytes(range(30))  # 10 palette entries
    idx = bytes([i % 10 for i in range(w * h)])
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += idx[y * w : (y + 1) * w]

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    d = png_decode(data)
    assert d["channels"] == 3
    want = b"".join(plte[i * 3 : i * 3 + 3] for i in idx)
    assert d["pixels"] == want


def test_png_rejects_garbage_and_interlace():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png at all")
    px = _pix(4 * 4 * 3)
    data = bytearray(png_encode(px, 4, 4))
    # IHDR body starts at offset 16; interlace is its last byte (+12)
    data[16 + 12] = 1
    # fix the CRC so only the interlace flag is the error
    body = bytes(data[16 : 16 + 13])
    data[16 + 13 : 16 + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        png_decode(bytes(data))


def test_png_corrupt_idat_and_short_ihdr_raise_valueerror():
    """ADVICE r11: malformed PNG bytes must raise ValueError like the
    gif/jpeg/wav decoders — never a leaking zlib.error/struct.error."""
    px = _pix(4 * 4 * 3)
    data = bytearray(png_encode(px, 4, 4))
    # corrupt the IDAT payload (IDAT starts after the 25-byte IHDR
    # chunk + 8-byte signature; flip bytes well inside the deflate
    # stream)
    idat_off = data.index(b"IDAT") + 8
    data[idat_off : idat_off + 4] = b"\xff\x00\xff\x00"
    with pytest.raises(ValueError, match="IDAT"):
        png_decode(bytes(data))
    # IHDR body shorter than the 13-byte spec: struct.error -> ValueError
    sig = data[:8]
    short_ihdr = struct.pack(">I", 5) + b"IHDR" + b"\x00" * 5 + b"\x00" * 4
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(bytes(sig) + short_ihdr)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 4), (5, 3), (7, 2), (6, 10)])
def test_bmp_round_trip_covers_padding(w, h):
    """w=5 and w=7 exercise non-zero row padding (stride % 4 != 0)."""
    px = _pix(w * h * 3, seed=h)
    d = bmp_decode(bmp_encode(px, w, h))
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"] == px


def test_bmp_top_down_and_32bit():
    """Hand-built top-down (negative height) 32-bit BMP decodes to the
    same top-down RGB as the 24-bit bottom-up encoder output."""
    w, h = 3, 2
    px = _pix(w * h * 3)
    rows = bytearray()
    for y in range(h):  # top-down storage order
        for x in range(w):
            r, g, b = px[(y * w + x) * 3 : (y * w + x) * 3 + 3]
            rows += bytes((b, g, r, 0xFF))
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(rows), 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    d = bmp_decode(head + info + bytes(rows))
    assert d["pixels"] == px


def test_bmp_rejects_compressed():
    w, h = 2, 2
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 1, 0, 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    with pytest.raises(NotImplementedError, match="compression"):
        bmp_decode(head + info + b"\x00" * 16)


def test_wav_round_trip_mono_and_stereo():
    samples = struct.pack("<8h", 0, 100, -100, 32767, -32768, 5, -5, 1)
    for ch, nframes in [(1, 8), (2, 4)]:
        d = wav_decode(wav_encode(samples, 16000, n_channels=ch))
        assert d["n_channels"] == ch
        assert d["sample_rate"] == 16000
        assert d["n_frames"] == nframes
        assert d["samples"] == samples


def test_sniff_and_decode_media_dispatch():
    png = png_encode(_pix(4 * 2 * 3), 4, 2)
    bmp = bmp_encode(_pix(4 * 2 * 3), 4, 2)
    wav = wav_encode(struct.pack("<4h", 1, 2, 3, 4), 8000)
    assert sniff_format(png) == "png"
    assert sniff_format(bmp) == "bmp"
    assert sniff_format(wav) == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0junk") == "jpeg"
    assert sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert sniff_format(b"plain text") is None

    m = decode_media(png)
    assert (m["kind"], m["format"], m["n_frames"]) == ("image", "png", 1)
    m = decode_media(bmp)
    assert (m["kind"], m["format"]) == ("image", "bmp")
    m = decode_media(wav)
    assert (m["kind"], m["width"], m["height"], m["n_frames"]) == (
        "audio", 1, 8000, 4,
    )
    # JPEG is decodable now (round 11); junk after a JPEG SOI is
    # MALFORMED, not unimplemented
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0junk")
    # MP4 containers parse now (round 12); a truncated ftyp with no
    # moov is MALFORMED, not unimplemented
    with pytest.raises(ValueError):
        decode_media(b"\x00\x00\x00\x18ftypmp42xxxx")
    with pytest.raises(ValueError, match="unrecognized"):
        decode_media(b"plain text")


def test_png_pixel_checksum_matches_generation_rule():
    """The battery's witness: sum of decoded pixel bytes equals the
    SQL-replayable sum of the generation rule — through a cycle of all
    five filters and the zlib stream."""
    for doc_id in [0, 7, 123, 250, 499]:
        w = 16 + doc_id % 17
        h = 16 + (doc_id * 7) % 13
        px = bytes((doc_id + i) % 251 for i in range(w * h * 3))
        d = png_decode(png_encode(px, w, h))
        assert sum(d["pixels"]) == sum(
            (doc_id + i) % 251 for i in range(w * h * 3)
        )


# ---------------------------------------------------------------------------
# GIF (round 11, part 2): real LZW, real multi-frame animation
# ---------------------------------------------------------------------------

from factstore_spark.operators.codecs import gif_decode, gif_encode  # noqa: E402


def _gray_rgb(indices: bytes) -> bytes:
    return b"".join(bytes((i, i, i)) for i in indices)


def test_gif_multiframe_round_trip():
    w, h = 24, 18
    frames = [bytes((s + i) % 251 for i in range(w * h)) for s in (0, 7, 99)]
    d = gif_decode(gif_encode(frames, w, h))
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 3)
    assert d["channels"] == 3
    for f_in, f_out in zip(frames, d["frames"]):
        assert f_out == _gray_rgb(f_in)
    assert d["pixels"] == d["frames"][0]


def test_gif_lzw_code_growth_and_dict_reset():
    """120x90 forces 9->10->11-bit codes; a 300x300 noise frame drives
    the dictionary to 4096 and through the mid-stream CLEAR reset."""
    import random

    big = bytes((i * 37 + (i >> 3)) % 251 for i in range(120 * 90))
    assert gif_decode(gif_encode([big], 120, 90))["frames"][0] == _gray_rgb(big)
    rnd = random.Random(42)
    noisy = bytes(rnd.randrange(251) for _ in range(300 * 300))
    assert gif_decode(gif_encode([noisy], 300, 300))["frames"][0] == _gray_rgb(
        noisy
    )


def test_gif_interlaced_decode():
    """Hand-build an interlaced frame: rows stored in 4-pass order must
    come back in display order. Uses the public encoder, then rewrites
    the image descriptor to claim interlacing with rows pre-shuffled."""
    w, h = 5, 9
    display = bytes(range(w * h))
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = b"".join(display[y * w : (y + 1) * w] for y in order)
    data = bytearray(gif_encode([stored], w, h))
    # image descriptor offset for this encoder's single-frame layout:
    # header 6 + LSD 7 + GCT 768 + graphic-control ext 8 (searching for
    # the 0x2C byte would hit palette entry 44 first)
    i = 6 + 7 + 768 + 8
    assert data[i] == 0x2C
    data[i + 9] |= 0x40
    d = gif_decode(bytes(data))
    assert d["frames"][0] == _gray_rgb(display)


def test_gif_sniff_and_decode_media_kind():
    from factstore_spark.operators.codecs import decode_media, sniff_format

    g = gif_encode([bytes(24 * 18)], 24, 18)
    assert sniff_format(g) == "gif"
    m = decode_media(g)
    assert (m["kind"], m["format"], m["n_frames"]) == ("image", "gif", 1)
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"GIFxx nope")


def test_gif_frame_rule_uniqueness():
    """The fixture rule's first-two-pixel embedding makes distinct h
    values byte-distinct even when (h1 - h2) % 251 == 0 — the property
    the frame-dup oracle's cross-class-zero claim rests on."""
    w, h = 24, 18

    def frame(hv: int) -> bytes:
        px = bytearray((hv + i) % 251 for i in range(w * h))
        px[0] = hv % 251
        px[1] = (hv // 251) % 251
        return bytes(px)

    # 1000 and 1251 collide mod 251; frames must still differ
    assert frame(1000) != frame(1251)
    assert frame(3 * 1000 + 1) == frame(3 * 1000 + 1)


def test_truncated_gif_and_wav_raise_valueerror_not_indexerror():
    """decode_media's documented contract: malformed bytes raise
    ValueError (or NotImplementedError for native formats) — a
    truncated GIF sub-block or a RIFF/WAVE header cut before the fmt
    chunk must not leak IndexError/EOFError into mapInPandas."""
    g = gif_encode([bytes(24 * 18)], 24, 18)
    for cut in (8, 12, 20, 700, len(g) // 2, len(g) - 3):
        with pytest.raises(ValueError):
            gif_decode(g[:cut])
    w = wav_encode(struct.pack("<4h", 1, 2, 3, 4), 8000)
    for cut in (4, 10, 12, 20):
        with pytest.raises(ValueError):
            wav_decode(w[:cut])


# ---------------------------------------------------------------------------
# Property-based round trips (hypothesis): random dims x random pixels
# must survive every codec byte-exactly — the encode side is the
# adversary the hand-picked cases cannot be.
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_dims = st.tuples(st.integers(1, 23), st.integers(1, 17))


@settings(max_examples=30, deadline=None)
@given(dims=_dims, channels=st.sampled_from([1, 2, 3, 4]),
       seed=st.integers(0, 2**31 - 1),
       mode=st.sampled_from(["cycle", "none"]))
def test_png_round_trip_property(dims, channels, seed, mode):
    w, h = dims
    rnd = __import__("random").Random(seed)
    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    d = png_decode(png_encode(px, w, h, channels=channels, filter_mode=mode))
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
    assert d["pixels"] == px


@settings(max_examples=30, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**31 - 1))
def test_bmp_round_trip_property(dims, seed):
    w, h = dims
    rnd = __import__("random").Random(seed)
    px = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    assert bmp_decode(bmp_encode(px, w, h))["pixels"] == px


@settings(max_examples=30, deadline=None)
@given(dims=_dims, n_frames=st.integers(1, 4), seed=st.integers(0, 2**31 - 1))
def test_gif_round_trip_property(dims, n_frames, seed):
    """Random pixels are LZW's worst case (dictionary churn); random
    REPETITIVE runs its best (long matches). Mix both per frame."""
    w, h = dims
    rnd = __import__("random").Random(seed)
    frames = []
    for _ in range(n_frames):
        if rnd.random() < 0.5:
            frames.append(bytes(rnd.randrange(256) for _ in range(w * h)))
        else:
            v = rnd.randrange(256)
            frames.append(bytes([v]) * (w * h))
    d = gif_decode(gif_encode(frames, w, h))
    assert d["n_frames"] == n_frames
    for f_in, f_out in zip(frames, d["frames"]):
        assert f_out == _gray_rgb(f_in)


@settings(max_examples=30, deadline=None)
@given(n=st.integers(1, 300), ch=st.sampled_from([1, 2]),
       rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31 - 1))
def test_wav_round_trip_property(n, ch, rate, seed):
    rnd = __import__("random").Random(seed)
    frames = n - (n % ch) or ch
    samples = b"".join(
        struct.pack("<h", rnd.randrange(-32768, 32768)) for _ in range(frames)
    )
    d = wav_decode(wav_encode(samples, rate, n_channels=ch))
    assert d["samples"] == samples
    assert d["sample_rate"] == rate
    assert d["n_frames"] == frames // ch


# ---------------------------------------------------------------------------
# JPEG (round 11, part 3): baseline sequential DCT, pure python+numpy
# ---------------------------------------------------------------------------

from factstore_spark.operators.codecs import (  # noqa: E402
    jpeg_decode,
    jpeg_encode,
)


def _flat_block_image(w: int, h: int, seed: int) -> bytes:
    """Grayscale image of flat 8x8 blocks — the byte-exact JPEG case
    (DC quant step 8 quantizes 8*(v-128) losslessly, ACs are zero)."""
    bw = w // 8
    px = bytearray(w * h)
    for by in range(h // 8):
        for bx in range(bw):
            v = (seed + by * bw + bx) % 251
            for yy in range(8):
                base = (by * 8 + yy) * w + bx * 8
                px[base : base + 8] = bytes([v]) * 8
    return bytes(px)


@pytest.mark.parametrize("w,h,seed", [(16, 16, 0), (24, 16, 7), (40, 32, 123)])
def test_jpeg_flat_blocks_round_trip_exactly(w, h, seed):
    px = _flat_block_image(w, h, seed)
    d = jpeg_decode(jpeg_encode(px, w, h, channels=1))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
    assert d["pixels"] == px


def test_jpeg_lossy_round_trip_within_tolerance():
    import random

    rnd = random.Random(5)
    w, h = 24, 24
    px = bytes(rnd.randrange(256) for _ in range(w * h))
    d = jpeg_decode(jpeg_encode(px, w, h, channels=1))
    err = max(abs(a - b) for a, b in zip(px, d["pixels"]))
    assert err <= 64, err  # AC quant 16 on white noise: bounded, lossy


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_color_round_trip(subsampling):
    w, h = 32, 24
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256))
    d = jpeg_decode(
        jpeg_encode(bytes(px), w, h, channels=3, subsampling=subsampling)
    )
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    err = max(abs(a - b) for a, b in zip(px, d["pixels"]))
    assert err <= (16 if subsampling == "444" else 48), err


def test_jpeg_odd_dimensions_and_dispatch():
    from factstore_spark.operators.codecs import decode_media

    w, h = 19, 13
    px = bytes((i * 7) % 251 for i in range(w * h))
    data = jpeg_encode(px, w, h, channels=1)
    assert sniff_format(data) == "jpeg"
    m = decode_media(data)
    assert (m["kind"], m["format"], m["width"], m["height"], m["n_frames"]) == (
        "image", "jpeg", w, h, 1,
    )
    assert len(m["pixels"]) == w * h


def test_jpeg_rejects_truncation_and_lossless():
    px = _flat_block_image(16, 16, 3)
    data = bytearray(jpeg_encode(px, 16, 16))
    for cut in (1, 4, 30, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            jpeg_decode(bytes(data[:cut]))
    # flip SOF0 (0xC0) to SOF3 (lossless): format-accurate boundary —
    # progressive (SOF2) is SUPPORTED since round 12, lossless is not
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jpeg_decode(bytes(data))


# ---------------------------------------------------------------------------
# JPEG round 12: restart intervals (DRI) + progressive (SOF2)
# ---------------------------------------------------------------------------

from factstore_spark.operators.codecs import (  # noqa: E402
    jpeg_encode_progressive,
)


@pytest.mark.parametrize("w,h,ri", [(16, 16, 1), (24, 16, 2), (40, 33, 3),
                                    (17, 9, 5)])
def test_jpeg_dri_round_trip_matches_plain(w, h, ri):
    """A DRI encode carries the SAME quantized coefficients as the
    plain encode — the decodes must match byte-exactly, through DC
    predictor resets and RSTn byte alignment."""
    px = bytes((i * 7 + w) % 251 for i in range(w * h))
    base = jpeg_decode(jpeg_encode(px, w, h))
    d = jpeg_decode(jpeg_encode(px, w, h, restart_interval=ri))
    assert d == base
    data = jpeg_encode(px, w, h, restart_interval=ri)
    assert b"\xff\xdd" in data  # DRI segment present
    assert any(bytes((0xFF, 0xD0 + m)) in data for m in range(8))


def test_jpeg_dri_color_and_flat_exact():
    w, h = 32, 24
    px = bytes(((i * 11) % 251) for i in range(w * h * 3))
    for sub in ("444", "420"):
        base = jpeg_decode(jpeg_encode(px, w, h, channels=3, subsampling=sub))
        got = jpeg_decode(
            jpeg_encode(px, w, h, channels=3, subsampling=sub,
                        restart_interval=1)
        )
        assert got == base, sub
    flat = _flat_block_image(24, 16, 9)
    d = jpeg_decode(jpeg_encode(flat, 24, 16, restart_interval=2))
    assert d["pixels"] == flat  # byte-exact through restarts


def test_jpeg_dri_out_of_sequence_marker_raises():
    px = bytes((i * 3) % 251 for i in range(24 * 24))
    data = bytearray(jpeg_encode(px, 24, 24, restart_interval=1))
    i = data.index(b"\xff\xd0")  # first RST0
    data[i + 1] = 0xD5  # out of sequence
    with pytest.raises(ValueError, match="restart marker"):
        jpeg_decode(bytes(data))


def test_jpeg_progressive_matches_baseline_exactly():
    """Progressive re-encodes the same quantized coefficients, so its
    decode must equal the baseline decode BYTE-EXACTLY — any slip in
    the spectral-selection / successive-approximation / EOB-run logic
    breaks this equality."""
    for w, h in [(8, 8), (16, 16), (17, 9), (40, 33)]:
        px = bytes((i * 13 + h) % 256 for i in range(w * h))
        base = jpeg_decode(jpeg_encode(px, w, h))
        prog = jpeg_decode(jpeg_encode_progressive(px, w, h))
        assert prog == base, (w, h)
    # SOF2 marker actually present
    data = jpeg_encode_progressive(bytes(64), 8, 8)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data


def test_jpeg_progressive_color_flat_and_eobruns():
    w, h = 32, 24
    px = bytes(((i * 5) % 251) for i in range(w * h * 3))
    for sub in ("444", "420"):
        base = jpeg_decode(jpeg_encode(px, w, h, channels=3, subsampling=sub))
        prog = jpeg_decode(
            jpeg_encode_progressive(px, w, h, channels=3, subsampling=sub)
        )
        assert prog == base, sub
    # flat blocks: every AC scan is one giant EOB run (all-zero band);
    # byte-exact reconstruction proves the EOBn path end to end
    flat = _flat_block_image(48, 40, 21)
    d = jpeg_decode(jpeg_encode_progressive(flat, 48, 40))
    assert d["pixels"] == flat


def test_jpeg_progressive_with_restarts():
    for w, h, ri in [(24, 24, 2), (17, 9, 1), (40, 16, 4)]:
        px = bytes((i * 9 + ri) % 256 for i in range(w * h))
        base = jpeg_decode(jpeg_encode(px, w, h))
        got = jpeg_decode(
            jpeg_encode_progressive(px, w, h, restart_interval=ri)
        )
        assert got == base, (w, h, ri)


def test_jpeg_progressive_custom_scan_script():
    """A script with different band splits / Al ladders must decode to
    the same pixels — the scan script only changes bit ordering."""
    w, h = 25, 18
    px = bytes((i * 17) % 256 for i in range(w * h))
    base = jpeg_decode(jpeg_encode(px, w, h))
    # each band keeps a consistent successive-approximation ladder
    # (T.81 G.1.1.1.2: a refinement's Ah must equal the band's prior Al)
    scans = [
        ([0], 0, 0, 0, 2),
        ([0], 1, 2, 0, 1), ([0], 3, 63, 0, 3),
        ([0], 3, 63, 3, 2), ([0], 3, 63, 2, 1),
        ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
        ([0], 1, 2, 1, 0), ([0], 3, 63, 1, 0),
    ]
    got = jpeg_decode(jpeg_encode_progressive(px, w, h, scans=scans))
    assert got == base


@settings(max_examples=25, deadline=None)
@given(dims=st.tuples(st.integers(1, 6), st.integers(1, 6)),
       seed=st.integers(0, 2**31 - 1),
       mode=st.sampled_from(["dri", "prog", "prog_ri"]))
def test_jpeg_dri_progressive_property(dims, seed, mode):
    """Property: for ANY image, DRI and progressive encodes decode
    byte-identically to the plain baseline encode (same quantized
    coefficients, different entropy framing)."""
    rnd = __import__("random").Random(seed)
    w, h = dims[0] * 7 + 1, dims[1] * 6 + 2
    px = bytes(rnd.randrange(256) for _ in range(w * h))
    base = jpeg_decode(jpeg_encode(px, w, h))
    ri = rnd.randrange(1, 6)
    if mode == "dri":
        got = jpeg_decode(jpeg_encode(px, w, h, restart_interval=ri))
    elif mode == "prog":
        got = jpeg_decode(jpeg_encode_progressive(px, w, h))
    else:
        got = jpeg_decode(
            jpeg_encode_progressive(px, w, h, restart_interval=ri)
        )
    assert got == base


@settings(max_examples=20, deadline=None)
@given(dims=st.tuples(st.integers(1, 5), st.integers(1, 4)),
       seed=st.integers(0, 2**31 - 1))
def test_jpeg_flat_block_property(dims, seed):
    """Property: ANY flat-block grayscale image round-trips exactly —
    the invariant the media_real_jpeg oracle rests on."""
    bw, bh = dims
    w, h = bw * 8, bh * 8
    px = _flat_block_image(w, h, seed % 251)
    assert jpeg_decode(jpeg_encode(px, w, h))["pixels"] == px


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container (round 12): box walk, sample tables, demux
# ---------------------------------------------------------------------------

from factstore_spark.operators.codecs import (  # noqa: E402
    mp4_decode_frames,
    mp4_encode_stub,
    mp4_probe,
)


def _mp4_samples(n, seed=0):
    return [
        bytes((seed + i * 7 + j) % 251 for j in range(50 + (seed + i) % 40))
        for i in range(n)
    ]


@pytest.mark.parametrize("n,chunks", [(1, 1), (8, 1), (13, 2), (13, 3),
                                      (20, 5), (7, 7)])
def test_mp4_probe_round_trip_and_demux(n, chunks):
    samples = _mp4_samples(n, seed=n)
    data = mp4_encode_stub(samples, 96, 64, frame_delta=40,
                           n_chunks=chunks)
    d = mp4_probe(data)
    assert (d["width"], d["height"], d["n_frames"]) == (96, 64, n)
    assert d["duration_ms"] == n * 40
    assert (d["codec"], d["handler"]) == ("avc1", "vide")
    # the demux must reassemble every sample byte in order, through
    # the stsc run expansion and per-chunk stco offsets
    assert d["samples"] == b"".join(samples)


def test_mp4_largesize_box_and_dispatch():
    from factstore_spark.operators.codecs import decode_media, sniff_format

    samples = _mp4_samples(5)
    data = mp4_encode_stub(samples, 32, 32, pad_free=64)
    assert sniff_format(data) == "mp4"
    d = mp4_probe(data)  # must walk the 64-bit-largesize free box
    assert d["n_frames"] == 5 and d["samples"] == b"".join(samples)
    m = decode_media(data)
    assert (m["kind"], m["format"], m["width"], m["height"], m["n_frames"]) == (
        "video", "mp4", 32, 32, 5,
    )


def test_mp4_frame_decode_is_the_native_boundary():
    data = mp4_encode_stub(_mp4_samples(3), 16, 16)
    with pytest.raises(NotImplementedError, match="h264|pyav"):
        mp4_decode_frames(data)


def test_mp4_malformed_raises_valueerror():
    data = bytearray(mp4_encode_stub(_mp4_samples(4), 16, 16))
    with pytest.raises(ValueError, match="ftyp"):
        mp4_probe(b"not an mp4 at all!!")
    with pytest.raises(ValueError):
        mp4_probe(bytes(data[: len(data) // 2]))  # truncated mid-boxes
    # corrupt a box size: claims past EOF
    i = bytes(data).index(b"moov") - 4
    data[i : i + 4] = (2 ** 31).to_bytes(4, "big")
    with pytest.raises(ValueError):
        mp4_probe(bytes(data))
    # stsz claiming more samples than mdat holds
    data = bytearray(mp4_encode_stub(_mp4_samples(4), 16, 16))
    j = bytes(data).index(b"stsz") + 12
    data[j : j + 4] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError):
        mp4_probe(bytes(data))


@settings(max_examples=20, deadline=None)
@given(n=st.integers(1, 30), chunks=st.integers(1, 6),
       seed=st.integers(0, 2**31 - 1))
def test_mp4_demux_property(n, chunks, seed):
    rnd = __import__("random").Random(seed)
    samples = [
        bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 120)))
        for _ in range(n)
    ]
    w, h = 16 * rnd.randrange(1, 9), 16 * rnd.randrange(1, 9)
    data = mp4_encode_stub(samples, w, h, n_chunks=chunks)
    d = mp4_probe(data)
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, n)
    assert d["samples"] == b"".join(samples)


def test_jpeg_progressive_rejects_invalid_scan_scripts():
    """Illegal successive-approximation ladders fail LOUDLY at encode
    time with a nameable reason — not as a baffling entropy-decode
    error downstream."""
    px = bytes(range(64))
    cases = [
        # refinement Ah must equal the band's prior Al
        [([0], 0, 0, 0, 1), ([0], 1, 63, 0, 1), ([0], 1, 63, 2, 1)],
        # refinement before the band's first scan
        [([0], 0, 0, 0, 0), ([0], 1, 63, 1, 0)],
        # AC scan before the component's DC first scan
        [([0], 1, 63, 0, 0)],
        # DC scans are exactly Ss=Se=0
        [([0], 0, 5, 0, 0)],
        # multi-component AC scan
        [([0], 0, 0, 0, 0), ([0, 0], 1, 63, 0, 0)],
    ]
    for scans in cases:
        with pytest.raises(ValueError):
            jpeg_encode_progressive(px, 8, 8, scans=scans)


@pytest.mark.parametrize("spf,per_sample", [(1, True), (3, True), (4, False),
                                            (99, True)])
def test_mp4_fragmented_round_trip(spf, per_sample):
    """fMP4 (moof/tfhd/trun): the fragmented layout must demux to the
    same bytes as the plain layout — through per-sample trun sizes AND
    the tfhd default-size shape."""
    if per_sample:
        samples = _mp4_samples(11, seed=spf)
    else:
        samples = [bytes((spf + j) % 251 for j in range(64))] * 11
    data = mp4_encode_stub(samples, 48, 32, fragmented=True,
                           samples_per_fragment=spf,
                           trun_per_sample_sizes=per_sample)
    assert data.count(b"moof") >= 1 and b"trex" in data
    d = mp4_probe(data)
    assert (d["width"], d["height"], d["n_frames"]) == (48, 32, 11)
    assert d["samples"] == b"".join(samples)
    assert d["sample_sizes"] == [len(x) for x in samples]
    plain = mp4_probe(mp4_encode_stub(samples, 48, 32))
    assert d["samples"] == plain["samples"]


def test_mp4_fragmented_malformed():
    data = bytearray(
        mp4_encode_stub(_mp4_samples(6), 16, 16, fragmented=True,
                        samples_per_fragment=3)
    )
    # truncate inside the last mdat: fragment sample past EOF
    with pytest.raises(ValueError):
        mp4_probe(bytes(data[:-10]))


@settings(max_examples=15, deadline=None)
@given(n=st.integers(1, 25), spf=st.integers(1, 8),
       seed=st.integers(0, 2**31 - 1))
def test_mp4_fragmented_property(n, spf, seed):
    rnd = __import__("random").Random(seed)
    samples = [
        bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 100)))
        for _ in range(n)
    ]
    data = mp4_encode_stub(samples, 32, 16, fragmented=True,
                           samples_per_fragment=spf)
    d = mp4_probe(data)
    assert d["n_frames"] == n
    assert d["samples"] == b"".join(samples)


def test_mp4_multi_track_selects_video():
    """Multi-track files (audio + video): the probe must pick the
    'vide' trak even when an audio trak comes first, and the fragment
    demux must skip other tracks' trafs."""
    import struct as _s

    samples = _mp4_samples(6, seed=2)
    data = mp4_encode_stub(samples, 80, 48, fragmented=True,
                           samples_per_fragment=3)
    # locate the moov box and the vide trak inside it
    i = data.index(b"moov") - 4
    (moov_size,) = _s.unpack(">I", data[i : i + 4])
    moov = bytearray(data[i : i + moov_size])
    j = bytes(moov).index(b"trak") - 4
    (trak_size,) = _s.unpack(">I", moov[j : j + 4])
    trak = bytes(moov[j : j + trak_size])
    # forge an AUDIO trak: same structure, handler 'soun', track_ID 2,
    # zero dims (audio tracks carry none)
    soun = bytearray(trak)
    h = bytes(soun).index(b"vide")
    soun[h : h + 4] = b"soun"
    tk = bytes(soun).index(b"tkhd") + 4  # -> version byte
    # v0 tkhd: track_ID at payload+12 -> tkhd tag end + 4 + 12
    soun[tk + 4 + 12 : tk + 4 + 16] = (2).to_bytes(4, "big")
    # prepend the audio trak INSIDE moov, before the video trak
    new_moov = bytearray(moov[:j]) + soun + moov[j:]
    new_moov[0:4] = _s.pack(">I", len(new_moov))
    patched = data[:i] + bytes(new_moov) + data[i + moov_size :]
    d = mp4_probe(patched)
    assert (d["handler"], d["width"], d["height"]) == ("vide", 80, 48)
    assert d["n_frames"] == 6
    assert d["samples"] == b"".join(samples)


def test_mp4_trun_wide_rows_round_trip():
    """trun rows carrying per-sample duration + cts offset (flags
    0x100/0x800) alongside sizes: the probe must skip the extra
    fields per sample and still land every demux offset."""
    samples = _mp4_samples(10, seed=4)
    data = mp4_encode_stub(samples, 32, 16, fragmented=True,
                           samples_per_fragment=3,
                           trun_sample_durations=True)
    d = mp4_probe(data)
    assert d["n_frames"] == 10
    assert d["samples"] == b"".join(samples)


# --- round-13 demux edges (VERDICT r12 task #2) ---------------------------


def test_mp4_co64_chunk_offsets():
    """64-bit co64 chunk offsets (the >4 GiB capture shape) must demux
    identically to stco — the r12 probe rejected these as 'missing
    sample tables'."""
    samples = _mp4_samples(9, seed=7)
    data = mp4_encode_stub(samples, 64, 48, use_co64=True, n_chunks=3)
    assert b"co64" in data and b"stco" not in data
    d = mp4_probe(data)
    assert d["samples"] == b"".join(samples)
    assert d["n_frames"] == 9
    assert d["duration_ms"] == 9 * 40
    # truncated co64 table raises, not garbage offsets
    i = data.index(b"co64") - 4
    import struct as _s

    (sz,) = _s.unpack(">I", data[i : i + 4])
    # shrink the declared entry count's data by cutting the box short
    broken = bytearray(data)
    broken[i + 4 + 4 + 4 : i + 4 + 4 + 4] = b""  # no-op; instead lie on count
    broken[i + 12 : i + 16] = _s.pack(">I", 1000)  # count >> box size
    with pytest.raises(ValueError):
        mp4_probe(bytes(broken))


@pytest.mark.parametrize("source", ["mehd", "fragments"])
@pytest.mark.parametrize("per_sample_durs", [False, True])
def test_mp4_pure_fmp4_duration(source, per_sample_durs):
    """A pure-fMP4 stream (mvhd duration 0) must report its real
    duration — from mvex/mehd when authored, else by summing the
    trun/tfhd sample durations (media timescale). The r12 probe
    reported 0."""
    samples = _mp4_samples(12, seed=3)
    data = mp4_encode_stub(
        samples, 48, 32, fragmented=True, samples_per_fragment=5,
        duration_source=source, trun_sample_durations=per_sample_durs,
    )
    d = mp4_probe(data)
    assert d["duration_ms"] == 12 * 40, (source, per_sample_durs, d["duration_ms"])
    assert d["samples"] == b"".join(samples)


def test_mp4_tfhd_prev_traf_end_base_fallback():
    """tfhd with NEITHER base-data-offset nor default-base-is-moof:
    the base is the previous traf's data end (ISO 14496-12 8.8.7.1) —
    a leading audio traf in each moof means moof-start would demux
    audio bytes as video. The r12 probe silently used moof-start."""
    samples = _mp4_samples(10, seed=5)
    data = mp4_encode_stub(
        samples, 80, 48, fragmented=True, samples_per_fragment=4,
        second_track=True,
    )
    d = mp4_probe(data)
    assert d["handler"] == "vide"
    assert d["n_frames"] == 10
    assert d["samples"] == b"".join(samples), "fallback base mis-resolved"
    # and the whole edge matrix composes
    combo = mp4_encode_stub(
        samples, 80, 48, fragmented=True, second_track=True,
        duration_source="fragments", samples_per_fragment=3,
    )
    dc = mp4_probe(combo)
    assert dc["samples"] == b"".join(samples)
    assert dc["duration_ms"] == 10 * 40


def test_mp4_edge_shapes_stay_fuzz_safe():
    """Malformed variants of the new shapes raise ValueError, never
    return garbage."""
    samples = _mp4_samples(8, seed=9)
    for kw in (
        {"use_co64": True, "n_chunks": 2},
        {"fragmented": True, "duration_source": "mehd"},
        {"fragmented": True, "second_track": True},
    ):
        data = mp4_encode_stub(samples, 32, 32, **kw)
        with pytest.raises(ValueError):
            mp4_probe(data[: len(data) - 7])  # truncated tail
        head = bytearray(data)
        head[3] = 0xFF  # corrupt ftyp size
        with pytest.raises(ValueError):
            mp4_probe(bytes(head))


def test_mp4_encode_stub_edge_param_validation():
    samples = _mp4_samples(4, seed=1)
    with pytest.raises(ValueError):
        mp4_encode_stub(samples, 16, 16, duration_source="nope")
    with pytest.raises(ValueError):
        mp4_encode_stub(samples, 16, 16, duration_source="mehd")  # not fragmented
    with pytest.raises(ValueError):
        mp4_encode_stub(samples, 16, 16, second_track=True)  # not fragmented
    with pytest.raises(ValueError):
        mp4_encode_stub(
            [b"a" * 8] * 4, 16, 16, fragmented=True, second_track=True,
            trun_per_sample_sizes=False,
        )


def test_mp4_stss_sync_samples():
    """stss keyframe table: 1-based indices parse to 0-based demux
    indices; absent stss means every sample is sync (spec 8.6.2)."""
    samples = _mp4_samples(11, seed=6)
    d = mp4_probe(mp4_encode_stub(samples, 32, 32, sync_every=3, n_chunks=2))
    assert d["keyframe_indices"] == [0, 3, 6, 9]
    d = mp4_probe(mp4_encode_stub(samples, 32, 32))
    assert d["keyframe_indices"] == list(range(11))
    # truncated stss raises
    data = bytearray(mp4_encode_stub(samples, 32, 32, sync_every=2))
    import struct as _s

    i = bytes(data).index(b"stss")
    data[i + 8 : i + 12] = _s.pack(">I", 9999)  # entry count >> box
    with pytest.raises(ValueError):
        mp4_probe(bytes(data))


def test_mp4_fragment_sync_flag_resolution():
    """Fragmented GOP shape: tfhd default-sample-flags non-sync +
    trun first-sample-flags sync -> keyframe = first sample of each
    fragment; without authored flags every fragment sample is sync."""
    samples = _mp4_samples(10, seed=8)
    d = mp4_probe(
        mp4_encode_stub(samples, 32, 32, fragmented=True,
                        samples_per_fragment=4, mark_fragment_sync=True)
    )
    assert d["keyframe_indices"] == [0, 4, 8]
    assert d["samples"] == b"".join(samples)
    d = mp4_probe(
        mp4_encode_stub(samples, 32, 32, fragmented=True,
                        samples_per_fragment=4)
    )
    assert d["keyframe_indices"] == list(range(10))
    # composes with the r13 edge shapes (duration + co64 matrix)
    d = mp4_probe(
        mp4_encode_stub(samples, 32, 32, fragmented=True,
                        samples_per_fragment=3, mark_fragment_sync=True,
                        duration_source="fragments")
    )
    assert d["keyframe_indices"] == [0, 3, 6, 9]
    assert d["duration_ms"] == 10 * 40
    d = mp4_probe(mp4_encode_stub(samples, 32, 32, sync_every=4, use_co64=True))
    assert d["keyframe_indices"] == [0, 4, 8]


# ---------------------------------------------------------------------------
# Round-14: presentation timing — ctts + elst (VERDICT r13 task #6)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fragmented", [False, True])
def test_mp4_ctts_composition_offsets(fragmented):
    """cts = dts + ctts offset, for both the stbl ctts v1 box and the
    per-sample signed trun offsets (version-1 trun, 8.8.8.1)."""
    n = 9
    samples = _mp4_samples(n, seed=3)
    kw = {"fragmented": True, "samples_per_fragment": 4} if fragmented else {}
    data = mp4_encode_stub(
        samples, 32, 32, ctts_pattern=[0, 80, 40], **kw
    )
    d = mp4_probe(data)
    assert d["sample_dts"] == [i * 40 for i in range(n)]
    assert d["sample_cts"] == [i * 40 + [0, 80, 40][i % 3] for i in range(n)]
    # no edit list: pts == cts
    assert d["sample_pts"] == d["sample_cts"]
    assert d["samples"] == b"".join(samples)  # timing never skews demux


@pytest.mark.parametrize("fragmented", [False, True])
def test_mp4_elst_edit_shift_and_empty_edit(fragmented):
    """pts applies the elst media_time shift and the leading empty-edit
    delay; negative ctts offsets (v1 signed) survive both layouts."""
    n = 6
    samples = _mp4_samples(n, seed=5)
    kw = {"fragmented": True, "samples_per_fragment": 2} if fragmented else {}
    data = mp4_encode_stub(
        samples, 32, 32, ctts_pattern=[80, -40, 0],
        elst_media_time=80, elst_empty=40, **kw
    )
    d = mp4_probe(data)
    assert d["elst_media_time"] == 80
    assert d["elst_empty_media"] == 40
    cts = [i * 40 + [80, -40, 0][i % 3] for i in range(n)]
    assert d["sample_cts"] == cts
    assert d["sample_pts"] == [c - 80 + 40 for c in cts]


def test_mp4_timing_absent_means_identity():
    """No ctts, no elst: cts == dts == pts — existing files keep
    reporting monotone decode-order stamps."""
    samples = _mp4_samples(5, seed=7)
    d = mp4_probe(mp4_encode_stub(samples, 32, 32))
    assert d["sample_dts"] == d["sample_cts"] == d["sample_pts"]
    assert d["elst_media_time"] == 0 and d["elst_empty_media"] == 0
    d2 = mp4_probe(
        mp4_encode_stub(samples, 32, 32, fragmented=True,
                        trun_sample_durations=True)
    )
    assert d2["sample_cts"] == d2["sample_dts"] == [i * 40 for i in range(5)]


def test_mp4_truncated_timing_tables_raise():
    """A ctts/elst/stts table whose declared entry count runs past the
    box must raise ValueError, never yield garbage stamps."""
    samples = _mp4_samples(6, seed=2)
    data = mp4_encode_stub(
        samples, 32, 32, ctts_pattern=[0, 40], elst_media_time=40
    )
    for tag in (b"ctts", b"elst", b"stts"):
        bad = bytearray(data)
        at = bytes(bad).index(tag)
        # inflate the 32-bit entry count (type @ at, version/flags
        # @ at+4..7, count @ at+8..11)
        bad[at + 9 : at + 12] = b"\xff\xff\xff"
        with pytest.raises(ValueError):
            mp4_probe(bytes(bad))
    # truncated tail of a timing-bearing file still raises
    with pytest.raises(ValueError):
        mp4_probe(data[: len(data) - 7])
