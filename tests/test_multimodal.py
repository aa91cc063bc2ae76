"""Real-codec multimodal semantics: WAV/PNG synthesize→parse round trips
on raw bytes (no Spark), corruption detection, and the Spark decode
pipeline over real-format payloads."""

from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.operators.multimodal import (
    _parse_png,
    _parse_wav,
    decode_media,
    decode_table,
    synth_media_table,
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
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


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
        for parser in (_parse_wav, _parse_png):
            try:
                parser(b)
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
    for r in rows:
        d = r["doc_id"]
        if d % 2 == 0:
            assert r["kind"] == "image"
            assert r["width"] == d % 64 + 1
            assert r["height"] == d * 3 % 48 + 1
            assert r["channels"] is None and r["n_samples"] is None
        else:
            assert r["kind"] == "audio"
            assert r["channels"] == (d // 2) % 2 + 1
            assert r["sample_rate"] == 8000 * (d % 3 + 1)
            assert r["n_samples"] == d % 256 + 16
            assert r["width"] is None and r["height"] is None
