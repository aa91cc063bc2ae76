"""Real-codec multimodal semantics: WAV/PNG synthesize→parse round trips
on raw bytes (no Spark), corruption detection, and the Spark decode
pipeline over real-format payloads."""

from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.operators.multimodal import (
    _parse_mp4,
    _parse_png,
    _parse_wav,
    decode_media,
    decode_table,
    synth_media_table,
    synthesize_mp4,
    synthesize_png,
    synthesize_wav,
)


def test_wav_roundtrip_known_params():
    b = synthesize_wav(channels=2, sample_rate=16000, n_samples=123, seed=5)
    p = _parse_wav(b)
    assert p["channels"] == 2
    assert p["sample_rate"] == 16000
    assert p["n_samples"] == 123
    assert p["bits_per_sample"] == 16
    assert p["duration_sec"] == pytest.approx(123 / 16000)


def test_wav_parser_is_stdlib_compatible(tmp_path):
    """Python's own `wave` module must agree with our parser — proof the
    synthesized bytes are a REAL WAV file, not a private format."""
    import wave

    b = synthesize_wav(channels=1, sample_rate=8000, n_samples=64, seed=9)
    f = tmp_path / "t.wav"
    f.write_bytes(b)
    with wave.open(str(f)) as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 8000
        assert w.getnframes() == 64
        assert w.getsampwidth() == 2


def test_png_roundtrip_known_params():
    b = synthesize_png(width=17, height=9, seed=3)
    p = _parse_png(b)
    assert p["width"] == 17 and p["height"] == 9
    assert p["bit_depth"] == 8 and p["color_type"] == 0
    assert p["interlaced"] is False


def test_png_pixels_decode_with_zlib():
    """The IDAT stream must actually inflate to height*(1+width) filtered
    scanline bytes — the image is decodable, not just a parseable header."""
    import struct
    import zlib

    w_, h_ = 5, 4
    b = synthesize_png(width=w_, height=h_, seed=1)
    # walk chunks, collect IDAT
    pos, idat = 8, b""
    while pos < len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += b[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    assert len(raw) == h_ * (1 + w_)
    assert all(raw[y * (1 + w_)] == 0 for y in range(h_))  # filter byte None


def test_png_pixel_decode_roundtrip():
    """Full decode of a synthesized PNG recovers the exact planted pixel
    formula — inflate + unfilter, end to end."""
    from trafsys_data_transfer_spark.operators.multimodal import decode_png_pixels

    w_, h_, seed = 13, 6, 42
    _, _, px = decode_png_pixels(synthesize_png(w_, h_, seed=seed))
    for y in range(h_):
        for x in range(w_):
            assert px[y * w_ + x] == (seed + x * 7 + y * 13) % 256


def test_png_unfilter_all_filter_types():
    """Hand-built PNGs using each non-trivial filter type (Sub/Up/Average/
    Paeth) must unfilter to the same known pixels — the spec algorithms,
    not just the filter-0 path the synthesizer emits."""
    import struct
    import zlib

    from trafsys_data_transfer_spark.operators.multimodal import (
        _paeth,
        decode_png_pixels,
    )

    w_, h_ = 4, 3
    pixels = [[(x * 11 + y * 29) % 256 for x in range(w_)] for y in range(h_)]

    def encode_with_filter(ftype):
        raw = bytearray()
        prev = [0] * w_
        for y in range(h_):
            raw.append(ftype)
            line = pixels[y]
            for x in range(w_):
                a = line[x - 1] if x else 0
                up = prev[x]
                c = prev[x - 1] if x else 0
                if ftype == 0:
                    f = line[x]
                elif ftype == 1:
                    f = (line[x] - a) & 0xFF
                elif ftype == 2:
                    f = (line[x] - up) & 0xFF
                elif ftype == 3:
                    f = (line[x] - (a + up) // 2) & 0xFF
                else:
                    f = (line[x] - _paeth(a, up, c)) & 0xFF
                raw.append(f)
            prev = line

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w_, h_, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    flat = bytes(v for row in pixels for v in row)
    for ftype in range(5):
        _, _, px = decode_png_pixels(encode_with_filter(ftype))
        assert px == flat, f"filter type {ftype} mis-decoded"


def test_resize_nearest_known_mapping():
    from trafsys_data_transfer_spark.operators.multimodal import resize_nearest

    # 4x2 image downsampled to 2x1: picks src (0,0) and (2,0)
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    assert resize_nearest(px, 4, 2, 2, 1) == bytes([10, 30])
    # identity resize returns the same bytes
    assert resize_nearest(px, 4, 2, 4, 2) == px


def test_wav_pcm_sample_roundtrip():
    from trafsys_data_transfer_spark.operators.multimodal import decode_wav_samples

    b = synthesize_wav(channels=2, sample_rate=8000, n_samples=5, seed=3)
    ch, samples = decode_wav_samples(b)
    assert ch == 2 and len(samples) == 10
    expected = [((3 * 31 + i * 257) % 65536) - 32768 for i in range(5)]
    assert samples == [v for e in expected for v in (e, e)]  # interleaved


def test_corrupt_payloads_fail_loudly():
    wav = synthesize_wav(1, 8000, 32)
    png = synthesize_png(8, 8)
    with pytest.raises(ValueError):
        _parse_wav(png)
    with pytest.raises(ValueError):
        _parse_png(wav)
    # flip one IHDR byte → CRC check must catch it
    broken = bytearray(png)
    broken[18] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(broken))
    # a bare ftyp header whose declared size overruns the buffer
    with pytest.raises(ValueError):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")
    # genuinely codec-less formats keep the injection-point contract
    with pytest.raises(NotImplementedError):
        decode_media(b"\x1a\x45\xdf\xa3", "video/webm")


def test_mp4_roundtrip_known_params():
    b = synthesize_mp4(
        width=640, height=360, duration_units=4500, timescale=3000, seed=4
    )
    p = _parse_mp4(b)
    assert p["kind"] == "video"
    assert p["major_brand"] == "isom"
    assert p["width"] == 640 and p["height"] == 360
    assert p["timescale"] == 3000 and p["duration_units"] == 4500
    assert p["duration_sec"] == pytest.approx(1.5)


def test_mp4_parser_handles_largesize_and_v1_headers():
    """Spec coverage beyond what the synthesizer emits: a 64-bit
    ``largesize`` mdat and version-1 mvhd/tkhd (64-bit times) must parse
    to the same planted values."""
    import struct

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    unity = struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )
    ftyp = box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxQQIQ", 1, 0, 0, 90000, 180000)
        + struct.pack(">ihxx", 0x00010000, 0x0100)
        + bytes(8) + unity + bytes(24) + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">BBBBQQIxxxxQ", 1, 0, 0, 7, 0, 0, 1, 180000)
        + bytes(8)
        + struct.pack(">hhhxx", 0, 0, 0)
        + unity
        + struct.pack(">II", 1920 << 16, 1080 << 16),
    )
    body = b"\x00" * 16
    largesize_mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    )
    p = _parse_mp4(ftyp + box(b"moov", mvhd + box(b"trak", tkhd)) + largesize_mdat)
    assert p["major_brand"] == "mp42"
    assert p["width"] == 1920 and p["height"] == 1080
    assert p["timescale"] == 90000 and p["duration_units"] == 180000
    assert p["duration_sec"] == pytest.approx(2.0)


def test_mp4_truncations_raise_valueerror():
    """Every strict prefix of a valid mp4 either still contains the full
    ftyp+moov metadata (a legal headers-only file) or raises ValueError —
    never a struct.error / garbage parse."""
    b = synthesize_mp4(100, 80, 2400, 1200, seed=7)
    full = _parse_mp4(b)
    import struct

    moov_end = None
    pos = 0
    while pos < len(b):
        size, btype = struct.unpack_from(">I4s", b, pos)
        if btype == b"moov":
            moov_end = pos + size
        pos += size
    for n in range(len(b)):
        try:
            p = _parse_mp4(b[:n])
        except ValueError:
            continue
        # parse succeeded: only legal at box boundaries past moov
        assert n >= moov_end and p == full


def test_parsers_never_crash_on_arbitrary_bytes():
    """Fuzz: any byte string either parses or raises ValueError — never a
    struct.error / IndexError escaping into the Arrow worker.  Seeds
    include truncations of VALID files, the nastiest real-world case."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    wav = synthesize_wav(2, 16000, 40, seed=1)
    png = synthesize_png(9, 7, seed=2)
    prefixes = [wav[:n] for n in (4, 11, 12, 13, 20, 21, 35)] + [
        png[:n] for n in (7, 8, 9, 16, 28, 30)
    ]

    @settings(max_examples=200, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=64),
            st.sampled_from(prefixes),
            st.binary(max_size=16).map(lambda junk: wav[: len(wav) // 2] + junk),
        )
    )
    def check(b):
        for parser in (_parse_wav, _parse_png, _parse_mp4):
            try:
                parser(b)
            except ValueError:
                pass

    check()


def test_mp4_parser_never_crashes_on_arbitrary_bytes():
    """Fuzz the box walk specifically: truncations of a valid mp4 (every
    hostile size field a real truncated upload produces), plus junk tails
    and random bytes — ValueError or a clean parse, nothing else."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    mp4 = synthesize_mp4(48, 32, 999, 2000, seed=11)

    @settings(max_examples=200, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=96),
            st.integers(min_value=0, max_value=len(mp4)).map(lambda n: mp4[:n]),
            st.binary(max_size=16).map(lambda junk: mp4[: len(mp4) // 2] + junk),
        )
    )
    def check(b):
        try:
            _parse_mp4(b)
        except ValueError:
            pass

    check()


def test_decode_table_roundtrips_planted_params(spark):
    """Spark pipeline: synthesize real container bytes per doc_id, decode
    via mapInPandas, check the recovered fields equal the planted
    formulas for every row."""
    mm = synth_media_table(spark, "/root/testdata/sf0.001")
    rows = decode_table(mm).collect()
    assert rows
    kinds = set()
    for r in rows:
        d = r["doc_id"]
        kinds.add(r["kind"])
        if d % 3 == 0:
            assert r["kind"] == "image"
            assert r["width"] == d % 64 + 1
            assert r["height"] == d * 3 % 48 + 1
            assert r["channels"] is None and r["n_samples"] is None
            assert r["duration_sec"] is None
        elif d % 3 == 1:
            assert r["kind"] == "audio"
            assert r["channels"] == (d // 2) % 2 + 1
            assert r["sample_rate"] == 8000 * ((d // 3) % 3 + 1)
            assert r["n_samples"] == d % 256 + 16
            assert r["width"] is None and r["height"] is None
        else:
            assert r["kind"] == "video"
            assert r["width"] == d % 128 + 16
            assert r["height"] == d * 5 % 96 + 16
            assert r["duration_sec"] == pytest.approx(
                (d % 5000 + 100) / (1000 * (d % 7 + 1))
            )
            assert r["channels"] is None and r["n_samples"] is None
    assert kinds == {"image", "audio", "video"}


def test_image_neardup_finds_every_planted_pair_and_nothing_else(spark, sf_dir):
    """dHash + banded LSH: every planted one-pixel-edit pair (id−16, id)
    for id ≡ 18 (mod 32) is recovered; no false pairs at hamming ≤ 6."""
    from trafsys_data_transfer_spark.operators.multimodal import (
        multimodal_image_neardup,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    from pyspark.sql import functions as F

    out = multimodal_image_neardup(spark, sf_dir).collect()
    max_id = (
        load_table(spark, sf_dir, "documents")
        .agg(F.max("doc_id"))
        .first()[0]
    )
    expected = {
        (d - 16, d) for d in range(18, max_id + 1, 2) if d % 32 == 18
    }
    assert {(r["doc_a"], r["doc_b"]) for r in out} == expected
    assert all(r["hamming"] <= 6 for r in out)


def test_dhash_stable_under_reencode_and_sensitive_to_texture(spark):
    """Same pixels re-encoded → identical hash; different seed → far."""
    from trafsys_data_transfer_spark.operators.multimodal import (
        dhash64,
        synthesize_png,
    )

    a = dhash64(synthesize_png(24, 20, seed=6, texture=True))
    a2 = dhash64(synthesize_png(24, 20, seed=6, texture=True))
    b = dhash64(synthesize_png(24, 20, seed=8, texture=True))
    assert a == a2
    assert bin((a ^ b) & (2**64 - 1)).count("1") > 12


# ---------------------------------------------------------------------------
# frame-level video decode (r8 — the former declared native-codec gap)
# ---------------------------------------------------------------------------


def test_rawvideo_roundtrip_exact_frame_bytes():
    """Every decoded frame's bytes equal the planted pixel formula
    exactly — offsets (stco), sizes (stsz), order (stsc), and timestamps
    (stts) all verified byte-for-byte."""
    from trafsys_data_transfer_spark.operators.multimodal import (
        decode_mp4_frames,
        synthesize_mp4_rawvideo,
    )

    w, h, nf, seed = 7, 5, 4, 23
    b = synthesize_mp4_rawvideo(w, h, nf, frame_duration=40, seed=seed)
    dec = decode_mp4_frames(b)
    assert (dec["width"], dec["height"], dec["depth"]) == (w, h, 24)
    assert len(dec["frames"]) == nf
    for f, (pts, fb) in enumerate(dec["frames"]):
        assert pts == f * 40
        assert len(fb) == w * h * 3
        want = bytes((seed * 31 + f * 101 + i * 7) % 256
                     for i in range(w * h * 3))
        assert fb == want


def test_rawvideo_track_still_parses_as_metadata():
    """The full-sample-table file is a superset of the metadata tier:
    _parse_mp4's header walk reads the same geometry/duration."""
    from trafsys_data_transfer_spark.operators.multimodal import (
        synthesize_mp4_rawvideo,
    )

    b = synthesize_mp4_rawvideo(12, 8, 3, timescale=1000, frame_duration=100,
                                seed=5)
    p = _parse_mp4(b)
    assert (p["width"], p["height"]) == (12, 8)
    assert p["duration_units"] == 300
    assert p["timescale"] == 1000


def test_compressed_codec_raises_the_injection_contract():
    """A non-'raw ' stsd entry must raise NotImplementedError naming the
    codec — the documented native-codec injection point, not a crash."""
    from trafsys_data_transfer_spark.operators.multimodal import (
        decode_mp4_frames,
        synthesize_mp4_rawvideo,
    )

    b = bytearray(synthesize_mp4_rawvideo(4, 4, 2, seed=1))
    i = b.find(b"raw ")
    b[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(bytes(b))


def test_frame_decoder_hostile_sample_tables_raise_valueerror():
    """ADVICE r08: the three table shapes the truncation fuzz can't
    reach — a zero first_chunk (would silently read stco[-1]), an
    inflated table count (would struct.error past the box end), and a
    non-final stsc run whose successor overruns stco (would IndexError)
    — all stay inside the ValueError contract."""
    import struct

    from trafsys_data_transfer_spark.operators import multimodal as mm

    good = mm.synthesize_mp4_rawvideo(6, 4, 3, seed=9)

    # first_chunk = 0: stsc body = version/flags(4) count(4) entry(12);
    # the entry's first_chunk is 8 bytes past the body start
    b = bytearray(good)
    pos = b.find(b"stsc") + 4
    struct.pack_into(">I", b, pos + 8, 0)
    with pytest.raises(ValueError, match="stco bounds"):
        mm.decode_mp4_frames(bytes(b))

    # inflated counts: each table's declared count must be validated
    # against its box length, not trusted into unpack_from
    for four_cc in (b"stts", b"stsc", b"stco"):
        b = bytearray(good)
        pos = b.find(four_cc) + 4
        struct.pack_into(">I", b, pos + 4, 1_000_000)
        with pytest.raises(ValueError, match="overruns its box"):
            mm.decode_mp4_frames(bytes(b))
    b = bytearray(good)
    pos = b.find(b"stsz") + 4
    struct.pack_into(">II", b, pos + 4, 72, 2**31)  # constant-size tier
    with pytest.raises(ValueError, match="exceeds file size"):
        mm.decode_mp4_frames(bytes(b))

    # non-final run whose successor's first_chunk exceeds len(stco)
    real_walk = mm._stbl_walk

    def hostile_walk(bb, body, bend):
        out = real_walk(bb, body, bend)
        out["stsc"] = [(1, 1, 1), (99, 1, 1)]  # successor → chunk 98
        return out

    mm._stbl_walk, walk = hostile_walk, mm._stbl_walk
    try:
        with pytest.raises(ValueError, match="stco bounds"):
            mm.decode_mp4_frames(good)
    finally:
        mm._stbl_walk = walk


def test_frame_decoder_never_crashes_on_arbitrary_bytes():
    """Fuzz the sample-table walk: truncations of a valid raw-video file
    (hostile stbl offsets/sizes), junk tails, random bytes — ValueError /
    NotImplementedError or a clean decode, nothing else escapes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trafsys_data_transfer_spark.operators.multimodal import (
        decode_mp4_frames,
        synthesize_mp4_rawvideo,
    )

    good = synthesize_mp4_rawvideo(6, 4, 3, seed=9)

    @settings(max_examples=200, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=64),
            st.integers(min_value=0, max_value=len(good)).map(
                lambda n: good[:n]
            ),
            st.binary(max_size=16).map(
                lambda junk: good[: len(good) * 2 // 3] + junk
            ),
        )
    )
    def check(b):
        try:
            decode_mp4_frames(b)
        except (ValueError, NotImplementedError):
            pass

    check()
