"""Real-decode multimodal pipeline (operators/multimodal.py round 11):
synthetic media with REAL encoded PNG/BMP/WAV bytes, decoded by the
pure-stdlib codecs inside mapInPandas on executors.

Contract under test: the synth corpus emits sniffable real formats;
decode_real_meta's dims/checksums match the generation rule (the same
arithmetic the battery oracles replay); real_thumbnails round-trips
through the PNG encoder; content hashing collapses exactly the
group_mod classes; real_decode satisfies the decode_fn contract inside
the pre-existing extract_media_meta plumbing.
"""

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators import multimodal as mm
from factstore_spark.operators.codecs import decode_media, sniff_format


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 120).select(F.col("id").alias("doc_id"))


def _expect_meta(s: int):
    """The generation rule, independently restated (keep in sync with
    synth_media_corpus and the MEDIA_REAL_META_SQL oracle)."""
    fmt = s % 3
    if fmt == 0:
        w, h = 16 + s % 17, 16 + (s * 7) % 13
        return "png", w, h, 1, sum((s + i) % 251 for i in range(w * h * 3))
    if fmt == 1:
        w, h = 8 + s % 21, 8 + (s * 5) % 11
        return "bmp", w, h, 1, sum((s + i) % 251 for i in range(w * h * 3))
    rate = 8000 + (s % 8) * 1000
    n = 64 + s % 129
    return "wav", 1, rate, n, sum(
        ((s * 31 + i * 7) % 65536) - 32768 for i in range(n)
    )


def test_synth_corpus_emits_real_sniffable_bytes(spark, ids):
    rows = mm.synth_media_corpus(ids).collect()
    assert len(rows) == 120
    for r in rows:
        data = bytes(r.data)
        assert sniff_format(data) == r.format
        m = decode_media(data)  # decodes without error
        assert m["format"] == r.format


def test_decode_real_meta_matches_generation_rule(spark, ids):
    media = mm.synth_media_corpus(ids)
    got = {r.media_id: r for r in mm.decode_real_meta(media).collect()}
    assert len(got) == 120
    for s in range(120):
        fmt, w, h, nf, cks = _expect_meta(s)
        r = got[s]
        assert (r.fmt, r.width, r.height, r.n_frames, r.checksum) == (
            fmt, w, h, nf, cks,
        ), f"doc {s}"


def test_real_thumbnails_round_trip_checksum(spark, ids):
    media = mm.synth_media_corpus(ids).filter(F.col("format") != "wav")
    got = {r.media_id: r for r in mm.real_thumbnails(media).collect()}
    for s in range(120):
        if s % 3 == 2:
            assert s not in got  # wav filtered out
            continue
        if s % 3 == 0:
            w, h = 16 + s % 17, 16 + (s * 7) % 13
        else:
            w, h = 8 + s % 21, 8 + (s * 5) % 11
        want = sum(
            (s + (((ty * h // 8) * w + (tx * w // 8)) * 3 + c)) % 251
            for ty in range(8)
            for tx in range(8)
            for c in range(3)
        )
        r = got[s]
        assert r.thumb_cks == want, f"doc {s}"
        # the emitted thumbnail is itself a real decodable 8x8 PNG
        d = decode_media(bytes(r.thumb))
        assert (d["width"], d["height"], d["format"]) == (8, 8, "png")
        assert sum(d["pixels"]) == want


def test_content_hash_collapses_group_classes(spark, ids):
    media = mm.synth_media_corpus(ids, group_mod=40)
    meta = mm.decode_real_meta(media)
    rows = meta.select("media_id", "content_hash").collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r.content_hash, set()).add(r.media_id % 40)
    # every content class maps to exactly one id class, and there are
    # exactly 40 of them (120 ids over mod 40)
    assert len(by_hash) == 40
    assert all(len(v) == 1 for v in by_hash.values())


def test_real_decode_satisfies_decode_fn_contract(spark, ids):
    """real_decode drops into the PRE-EXISTING extract_media_meta hook
    (the one-argument swap the stub docs promised)."""
    media = mm.synth_media_corpus(ids)
    out = mm.extract_media_meta(media, decode_fn=mm.real_decode)
    got = {r.media_id: r for r in out.collect()}
    for s in [0, 1, 2, 50, 119]:
        fmt, w, h, nf, _cks = _expect_meta(s)
        assert (got[s].width, got[s].height, got[s].n_frames) == (w, h, nf)


def test_real_decode_raises_only_for_native_formats():
    # MP4 CONTAINERS parse since round 12; only the H.264 payload
    # decode is native-lib. A header-only container is malformed.
    with pytest.raises(ValueError):
        mm.real_decode(b"\x00\x00\x00\x18ftypmp42 header")
    from factstore_spark.operators.codecs import (
        mp4_decode_frames,
        mp4_encode_stub,
    )

    valid = mp4_encode_stub([b"x" * 40, b"y" * 41], 32, 16)
    assert mm.real_decode(valid) == (32, 16, 2)
    with pytest.raises(NotImplementedError, match="h264|H.264|pyav"):
        mp4_decode_frames(valid)
    with pytest.raises(ValueError):
        mm.real_decode(b"no such format")
    # a JPEG header followed by junk is malformed, never unimplemented
    with pytest.raises(ValueError):
        mm.real_decode(b"\xff\xd8\xff\xe0 jpeg junk")


# -- real FRAME pipeline (round 11, part 2: animated GIF) --------------------


def _gif_expect_h(d: int):
    nf = 2 + d % 7
    return {(d % 40) * 1000 + (f % 3) for f in range(nf)}


def test_synth_gif_corpus_decodes_to_rule_frames(spark, ids):
    from factstore_spark.operators.codecs import decode_media

    rows = mm.synth_gif_corpus(ids).collect()
    assert len(rows) == 120
    for r in rows[:20]:
        m = decode_media(bytes(r.data))
        d = r.media_id
        assert m["format"] == "gif"
        assert m["n_frames"] == 2 + d % 7
        assert (m["width"], m["height"]) == (mm.GIF_FRAME_W, mm.GIF_FRAME_H)


def test_real_sample_frames_every_frame(spark, ids):
    media = mm.synth_gif_corpus(ids.filter("doc_id < 20"))
    got = mm.real_sample_frames(media).collect()
    per = {}
    for r in got:
        per.setdefault(r.media_id, []).append(r.frame_no)
    assert set(per) == set(range(20))
    for d, nos in per.items():
        assert sorted(nos) == list(range(2 + d % 7))


def test_real_frame_dup_matches_id_arithmetic(spark, ids):
    """Pairs from DECODED frame hashes must equal the generation rule:
    same id-class pairs share exactly min(nf_a, nf_b, 3) frames,
    cross-class pairs none."""
    media = mm.synth_gif_corpus(ids)
    got = {
        (r.id_a, r.id_b): r.shared_frames
        for r in mm.real_frame_dup_pairs(media, min_shared=1).collect()
    }
    want = {}
    for a in range(120):
        for b in range(a + 1, 120):
            shared = len(_gif_expect_h(a) & _gif_expect_h(b))
            if shared >= 1:
                want[(a, b)] = shared
    assert got == want


def test_real_thumbnails_keep_color_for_rgba(spark):
    """Regression (round-11 review): 4-channel input must keep its
    COLOR channels (drop alpha), not replicate the red channel."""
    from factstore_spark.operators.codecs import png_decode, png_encode

    w, h = 16, 16
    # strongly colored RGBA: R=10, G=200, B=30, A=255 everywhere
    px = bytes([10, 200, 30, 255] * (w * h))
    data = png_encode(px, w, h, channels=4)
    df = spark.createDataFrame([(1, bytearray(data))], "media_id long, data binary")
    r = mm.real_thumbnails(df, target_w=4, target_h=4).collect()[0]
    thumb = png_decode(bytes(r.thumb))
    assert thumb["pixels"] == bytes([10, 200, 30] * 16)
    assert r.thumb_cks == (10 + 200 + 30) * 16


def test_synth_jpeg_corpus_decodes_exactly(spark, ids):
    """Flat-block JPEG fixtures: decode_real_meta's dims and checksum
    must equal the generation rule exactly — through huffman entropy
    coding, dequantization, and the IDCT."""
    media = mm.synth_jpeg_corpus(ids)
    got = {r.media_id: r for r in mm.decode_real_meta(media).collect()}
    assert len(got) == 120
    for d in range(120):
        bw = 2 + d % 4
        bh = 2 + d % 3
        want_cks = sum(64 * ((d + i) % 251) for i in range(bw * bh))
        r = got[d]
        assert (r.fmt, r.width, r.height, r.n_frames, r.checksum) == (
            "jpeg", 8 * bw, 8 * bh, 1, want_cks,
        ), f"doc {d}"


def test_mp4_sample_stats_demuxes_per_sample(spark):
    """Per-sample demux rows: sizes, first bytes and FNV content
    hashes line up with the container's sample tables, across
    multi-chunk layouts."""
    import pandas as pd
    from factstore_spark.operators.codecs import mp4_encode_stub

    samples_a = [b"aaa", b"bbbb", b"aaa"]
    samples_b = [b"aaa", b"zzzzz"]
    rows = [
        (1, mp4_encode_stub(samples_a, 16, 16, n_chunks=2)),
        (2, mp4_encode_stub(samples_b, 32, 16)),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {
        (r.media_id, r.sample_idx): r
        for r in mm.mp4_sample_stats(df).collect()
    }
    assert len(got) == 5
    assert (got[(1, 0)].size, got[(1, 0)].first_byte) == (3, ord("a"))
    assert (got[(1, 1)].size, got[(1, 1)].first_byte) == (4, ord("b"))
    # identical bytes -> identical content hash, across containers
    assert got[(1, 0)].content_fnv == got[(1, 2)].content_fnv
    assert got[(1, 0)].content_fnv == got[(2, 0)].content_fnv
    assert got[(1, 1)].content_fnv != got[(2, 1)].content_fnv


def test_audio_gating_stats_hand_computed(spark):
    """Windowed energy/ZC gating over a hand-built WAV: silence then a
    loud square wave — the silent window must gate out, the loud one
    in, and zero-crossings count only within-window sign flips."""
    import struct

    from factstore_spark.operators.codecs import wav_encode
    from factstore_spark.operators.multimodal import audio_gating_stats

    # window=4: [0,0,0,0] silent; [20000,-20000,20000,-20000] loud (3 zc);
    # ragged tail [5] dropped
    samples = [0, 0, 0, 0, 20000, -20000, 20000, -20000, 5]
    raw = b"".join(struct.pack("<h", s) for s in samples)
    wav = wav_encode(raw, 8000, n_channels=1)
    df = spark.createDataFrame([(1, bytearray(wav))], "media_id long, data binary")
    row = audio_gating_stats(
        df, window=4, energy_threshold=1_000_000
    ).collect()[0]
    assert row.n_windows == 2
    assert row.active_windows == 1
    assert row.total_energy == 4 * 20000 * 20000
    assert row.zero_crossings == 3  # the flat window contributes none


def test_media_audio_gating_entry_nonvacuous(spark, sf_dir):
    """The battery entry must produce BOTH active and silent windows on
    the driver corpus (a threshold that gates nothing would make the
    oracle comparison vacuous)."""
    from factstore_spark import queries as q

    out = q.media_audio_gating(spark, sf_dir).collect()
    assert out
    assert sum(r.active_windows for r in out) > 0
    assert sum(r.n_windows - r.active_windows for r in out) > 0
