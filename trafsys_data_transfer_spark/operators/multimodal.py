"""Multimodal columns: binary payloads + typed metadata (north star §2.10).

Model: media lives in opaque ``BinaryType`` columns next to typed metadata
(media_type, byte_length, digest); decode / feature-extract / frame-sample
run as Arrow-batched Pandas UDFs over ``mapInPandas`` so bytes cross the
JVM↔Python boundary in columnar batches, never row-at-a-time.

:func:`decode_media` ships REAL pure-stdlib codecs for all three public
container formats the fixtures cycle: RIFF/WAVE (fmt/data chunk walk),
PNG (signature + CRC-verified IHDR, full five-filter pixel decode), and
ISO-BMFF mp4 (box walk: ftyp brand, mvhd duration/timescale, tkhd
geometry — the metadata hop ffprobe does before touching samples).
Frame-level VIDEO decode is the one remaining native-codec slot: an
unknown media_type still raises ``NotImplementedError`` as the documented
ffmpeg/PIL injection point, swappable without touching the Spark
plumbing.  The fixture generators below synthesize real-format bytes with
known parameters, so decode is oracle-checked end to end: plant → encode
→ parse → compare against the planted values in SQL.

Scale posture: payload columns make parquet row groups large — keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so a partition is
a bounded number of payloads, and push projections so metadata-only
queries never deserialize bytes (columnar pruning does this for free).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Media types cycled deterministically over the fixture corpus.
MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")

META_SCHEMA = (
    "doc_id long, media_type string, byte_length long, content_md5 string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, frame_bytes long"

FEATURE_SCHEMA = "doc_id long, feature array<float>"


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-derived multimodal table: text bytes as the opaque payload
    (stand-in for real media), media_type from doc_id."""
    from ..session import spread

    # r11: spread at the fixture chokepoint — every consumer feeds this
    # table straight into a mapInPandas codec, which otherwise runs in
    # ONE Python worker off the single-file scan.
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
    )


# ---------------------------------------------------------------------------
# real pure-stdlib codecs: RIFF/WAVE and PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_wav(b: bytes) -> dict:
    """Parse a RIFF/WAVE container: chunk walk for ``fmt `` (PCM format
    struct) and ``data`` (payload size).  Word-aligned chunk skipping per
    the RIFF spec; unknown chunks (LIST, cue, …) are skipped, matching how
    real readers behave."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"fmt " and size >= 16:
            if pos + 8 + 16 > len(b):  # declared fmt chunk truncated
                raise ValueError("WAVE fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", b, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data_size is None:
        raise ValueError("WAVE missing fmt/data chunk")
    _, channels, sample_rate, _, block_align, bits = fmt
    n_samples = data_size // block_align if block_align else 0
    return {
        "kind": "audio",
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_sec": n_samples / sample_rate if sample_rate else 0.0,
    }


def _parse_png(b: bytes) -> dict:
    """Parse a PNG: 8-byte signature, then the mandatory first IHDR chunk
    (width/height/depth/color-type), with the IHDR CRC verified — a
    corrupted header fails loudly instead of yielding garbage geometry."""
    import struct
    import zlib

    if not b.startswith(_PNG_SIG) or len(b) < 33:
        raise ValueError("not a PNG")
    length, ctype = struct.unpack_from(">I4s", b, 8)
    if ctype != b"IHDR" or length != 13:
        raise ValueError("PNG first chunk is not IHDR")
    body = b[16:29]
    (crc,) = struct.unpack_from(">I", b, 29)
    if zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": color,
        "interlaced": bool(interlace),
    }


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) walking ISO-BMFF boxes in
    ``b[start:end]``.  Handles 64-bit ``largesize`` (size==1) and
    to-end-of-file (size==0) per ISO/IEC 14496-12 §4.2; any declared size
    that runs past the buffer, or a header that doesn't fit, raises
    ``ValueError`` — truncated files fail loudly."""
    import struct

    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4 box header truncated")
        size, btype = struct.unpack_from(">I4s", b, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4 largesize header truncated")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"mp4 box {btype!r} size overruns buffer")
        yield btype, body, pos + size
        pos += size


def _parse_mp4(b: bytes) -> dict:
    """Parse an ISO-BMFF (mp4) container with a pure-stdlib box walk:
    ``ftyp`` major brand, ``moov``→``mvhd`` timescale/duration (version
    0 and 1), first ``moov``→``trak``→``tkhd`` width/height (16.16 fixed
    point, both versions).  Geometry/duration live in the movie header,
    not the codec bitstream, so no native decoder is needed — this is the
    same metadata hop MP4Box/ffprobe do before touching samples."""
    import struct

    if len(b) < 8:
        raise ValueError("not an ISO-BMFF file (too short)")
    brand = None
    mvhd = None
    tkhd = None
    for btype, body, bend in _mp4_boxes(b, 0, len(b)):
        if btype == b"ftyp":
            if bend - body < 8:
                raise ValueError("mp4 ftyp box truncated")
            brand = b[body : body + 4].decode("ascii", "replace")
        elif btype == b"moov":
            for ctype, cbody, cend in _mp4_boxes(b, body, bend):
                if ctype == b"mvhd" and mvhd is None:
                    if cend - cbody < 4:
                        raise ValueError("mp4 mvhd truncated")
                    ver = b[cbody]
                    if ver == 1:
                        if cend - cbody < 32:
                            raise ValueError("mp4 mvhd v1 truncated")
                        ts, dur = struct.unpack_from(">IQ", b, cbody + 20)
                    else:
                        if cend - cbody < 20:
                            raise ValueError("mp4 mvhd v0 truncated")
                        ts, dur = struct.unpack_from(">II", b, cbody + 12)
                    mvhd = (ts, dur)
                elif ctype == b"trak" and tkhd is None:
                    for ttype, tbody, tend in _mp4_boxes(b, cbody, cend):
                        if ttype == b"tkhd":
                            ver = b[tbody]
                            need = 92 if ver == 1 else 80
                            if tend - tbody < need + 4:
                                raise ValueError("mp4 tkhd truncated")
                            w16, h16 = struct.unpack_from(
                                ">II", b, tbody + need - 4
                            )
                            tkhd = (w16 >> 16, h16 >> 16)
                            break
    if brand is None:
        raise ValueError("mp4 missing ftyp box")
    if mvhd is None or tkhd is None:
        raise ValueError("mp4 missing moov/mvhd/tkhd")
    ts, dur = mvhd
    w, h = tkhd
    return {
        "kind": "video",
        "major_brand": brand,
        "width": w,
        "height": h,
        "timescale": ts,
        "duration_units": dur,
        "duration_sec": dur / ts if ts else 0.0,
    }


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode a media payload to typed properties.

    Real pure-stdlib parsers for all three fixture formats: ``audio/wav``
    (RIFF chunk walk), ``image/png`` (CRC-verified IHDR), ``video/mp4``
    (ISO-BMFF box walk — ftyp brand, mvhd duration/timescale, tkhd
    geometry).  Frame-level video decode would still need a native codec
    (ffmpeg) injected here, but every header/metadata field the pipeline
    consumes is parsed from real container bytes."""
    b = bytes(payload)
    if media_type == "audio/wav":
        return _parse_wav(b)
    if media_type == "image/png":
        return _parse_png(b)
    if media_type == "video/mp4":
        return _parse_mp4(b)
    raise NotImplementedError(
        f"no decoder available for {media_type}; install codecs and inject"
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_pixels(b: bytes) -> tuple[int, int, bytes]:
    """FULL PNG pixel decode for 8-bit grayscale: IDAT inflate (zlib) +
    per-scanline unfilter, all five PNG filter types (None/Sub/Up/
    Average/Paeth).  Returns (width, height, row-major pixel bytes).
    Color/palette/interlaced images raise — the documented scope is the
    grayscale profile the fixture synthesizer emits, but the unfilter is
    the real spec algorithm, unit-tested per filter type."""
    import struct
    import zlib

    meta = _parse_png(b)
    if meta["bit_depth"] != 8 or meta["color_type"] != 0 or meta["interlaced"]:
        raise ValueError("decode_png_pixels supports non-interlaced 8-bit grayscale")
    w, h = meta["width"], meta["height"]
    pos, idat = 8, b""
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += b[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    if len(raw) != h * (1 + w):
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray()
    prev = bytes(w)
    for y in range(h):
        ftype = raw[y * (1 + w)]
        line = bytearray(raw[y * (1 + w) + 1 : (y + 1) * (1 + w)])
        for x in range(w):
            a = line[x - 1] if x else 0  # left (bpp=1)
            up = prev[x]
            c = prev[x - 1] if x else 0
            if ftype == 1:
                line[x] = (line[x] + a) & 0xFF
            elif ftype == 2:
                line[x] = (line[x] + up) & 0xFF
            elif ftype == 3:
                line[x] = (line[x] + (a + up) // 2) & 0xFF
            elif ftype == 4:
                line[x] = (line[x] + _paeth(a, up, c)) & 0xFF
            elif ftype != 0:
                raise ValueError(f"unknown PNG filter type {ftype}")
        out += line
        prev = bytes(line)
    return w, h, bytes(out)


def resize_nearest(px: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of row-major grayscale pixels:
    ``src = (dst * src_dim) // dst_dim`` — integer math, deterministic,
    and mirrored exactly by the SQL oracle."""
    out = bytearray(out_w * out_h)
    for y2 in range(out_h):
        sy = y2 * h // out_h
        base = sy * w
        obase = y2 * out_w
        for x2 in range(out_w):
            out[obase + x2] = px[base + (x2 * w // out_w)]
    return bytes(out)


def decode_wav_samples(b: bytes) -> tuple[int, list[int]]:
    """Decode 16-bit PCM WAVE payload bytes to (channels, samples) —
    interleaved int16 little-endian, the real ``data`` chunk contents."""
    import struct

    meta = _parse_wav(b)
    if meta["bits_per_sample"] != 16:
        raise ValueError("decode_wav_samples supports 16-bit PCM")
    # locate the data chunk again (parse only returns its size)
    pos = 12
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"data":
            body = b[pos + 8 : pos + 8 + size]
            n = len(body) // 2
            return meta["channels"], list(struct.unpack(f"<{n}h", body[: 2 * n]))
        pos += 8 + size + (size & 1)
    raise ValueError("WAVE missing data chunk")


def synthesize_wav(
    channels: int, sample_rate: int, n_samples: int, bits: int = 16, seed: int = 0
) -> bytes:
    """Real RIFF/WAVE bytes with deterministic PCM content: a seeded
    sawtooth, struct-packed little-endian — decodable by any WAV reader."""
    import struct

    block_align = channels * bits // 8
    frames = bytearray()
    for i in range(n_samples):
        v = ((seed * 31 + i * 257) % 65536) - 32768
        for _ in range(channels):
            frames += struct.pack("<h", v)
    data = bytes(frames)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def synthesize_png(width: int, height: int, seed: int = 0, texture: bool = False) -> bytes:
    """Real 8-bit grayscale PNG bytes: deterministic pixels, zlib-packed
    scanlines, CRC'd chunks — opens in any image viewer."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter byte: None
        for x in range(width):
            if texture:
                # hash-textured pixels: every image gets a distinct,
                # random-looking dHash.  The default smooth gradient has a
                # CONSTANT horizontal derivative sign, which would collapse
                # every image to one identical dHash; and a purely ADDITIVE
                # seed mix leaves cross-seed pixel correlations that showed
                # up as thousands of hamming≤6 false pairs at sf0.1 — hence
                # the murmur-style multiply-after-xor finalizer.
                v = (
                    (x * 73856093) ^ (y * 19349663) ^ (seed * 83492791)
                ) & 0xFFFFFFFF
                v = (v ^ (v >> 16)) * 0x45D9F3B & 0xFFFFFFFF
                v = (v ^ (v >> 16)) * 0x45D9F3B & 0xFFFFFFFF
                raw.append((v ^ (v >> 16)) % 256)
            else:
                raw.append((seed + x * 7 + y * 13) % 256)
    idat = zlib.compress(bytes(raw), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synthesize_mp4(
    width: int,
    height: int,
    duration_units: int,
    timescale: int,
    seed: int = 0,
    n_mdat_bytes: int = 64,
) -> bytes:
    """Real ISO-BMFF bytes with deterministic planted parameters: ``ftyp``
    (isom/mp42), ``moov`` holding a version-0 ``mvhd`` (timescale,
    duration) and one ``trak``/``tkhd`` (16.16 fixed-point geometry), and
    an ``mdat`` of seeded filler — box structure walkable by any BMFF
    reader (MP4Box, ffprobe, this module's :func:`_parse_mp4`)."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    unity = struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp42")
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration_units)
        + struct.pack(">ihxx", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + bytes(8)
        + unity
        + bytes(24)
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">BBBBIIIxxxxI", 0, 0, 0, 7, 0, 0, 1, duration_units)
        + bytes(8)
        + struct.pack(">hhhxx", 0, 0, 0)
        + unity
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    mdat = box(
        b"mdat",
        bytes((seed * 31 + i * 257) % 256 for i in range(n_mdat_bytes)),
    )
    return ftyp + moov + mdat


def synthesize_mp4_rawvideo(
    width: int,
    height: int,
    n_frames: int,
    timescale: int = 1000,
    frame_duration: int = 100,
    seed: int = 0,
) -> bytes:
    """Real ISO-BMFF bytes with a PLAYABLE uncompressed-RGB video track —
    the full sample-table tier :func:`synthesize_mp4` stops short of:
    ``moov/trak/mdia`` carries ``mdhd``/``hdlr('vide')`` and a complete
    ``stbl`` (``stsd`` with a ``raw `` 24-bit VideoSampleEntry, ``stts``
    constant frame duration, ``stsc`` one chunk, ``stsz`` constant sample
    size, ``stco`` absolute mdat offset), and ``mdat`` holds the actual
    RGB24 frames.  Pixel bytes follow the planted formula
    ``byte(f, i) = (seed*31 + f*101 + i*7) % 256`` so any frame decoded
    anywhere in the corpus is hash-checkable against closed-form SQL
    (same discipline as :func:`synthesize_png`'s planted filters).
    ISO/IEC 14496-12 box layout; 'raw ' sample entry per QuickTime RGB."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    frame_size = width * height * 3
    duration = n_frames * frame_duration
    unity = struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp42")
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">ihxx", 0x00010000, 0x0100)
        + bytes(8)
        + unity
        + bytes(24)
        + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">BBBBIIIxxxxI", 0, 0, 0, 7, 0, 0, 1, duration)
        + bytes(8)
        + struct.pack(">hhhxx", 0, 0, 0)
        + unity
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = box(
        b"mdhd",
        struct.pack(">BxxxIIIIHH", 0, 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = box(
        b"hdlr", struct.pack(">Bxxx4x4s12x", 0, b"vide") + b"rawvideo\x00"
    )
    # 'raw ' VideoSampleEntry: SampleEntry header (6 reserved + dref idx),
    # then the 70-byte visual fields (ISO 14496-12 §12.1.3), depth 24.
    sample_entry = box(
        b"raw ",
        bytes(6)
        + struct.pack(">H", 1)
        + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + bytes(4)
        + struct.pack(">H", 1)
        + bytes(32)
        + struct.pack(">Hh", 24, -1),
    )
    stsd = box(b"stsd", struct.pack(">BxxxI", 0, 1) + sample_entry)
    stts = box(
        b"stts", struct.pack(">BxxxIII", 0, 1, n_frames, frame_duration)
    )
    stsc = box(b"stsc", struct.pack(">BxxxIIII", 0, 1, 1, n_frames, 1))
    stsz = box(b"stsz", struct.pack(">BxxxII", 0, frame_size, n_frames))
    # stco needs the absolute file offset of frame 0 — every box size is
    # fixed now, so compute the layout with a placeholder then rebuild
    # (the 4-byte offset doesn't change any size).
    def build(first_frame_offset: int) -> bytes:
        stco = box(b"stco", struct.pack(">BxxxII", 0, 1, first_frame_offset))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = box(b"vmhd", struct.pack(">BBBBHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
        dref = box(
            b"dref",
            struct.pack(">BxxxI", 0, 1) + box(b"url ", struct.pack(">I", 1)),
        )
        dinf = box(b"dinf", dref)
        minf = box(b"minf", vmhd + dinf + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
        return moov

    moov = build(0)
    first_frame_offset = len(ftyp) + len(moov) + 8  # + mdat header
    moov = build(first_frame_offset)
    frames = bytearray()
    for f in range(n_frames):
        base = seed * 31 + f * 101
        frames += bytes((base + i * 7) % 256 for i in range(frame_size))
    return ftyp + moov + box(b"mdat", bytes(frames))


def _stbl_walk(b: bytes, body: int, bend: int) -> dict:
    """Parse the sample-table boxes under an ``stbl`` body range.

    Hostile-input contract (ADVICE r08): every declared table count is
    validated against the enclosing box's byte length BEFORE any
    ``struct.unpack_from`` that trusts it, so truncated or
    inflated-count boxes raise ``ValueError`` — never ``struct.error``
    or an out-of-bounds read — and a count can never allocate more than
    O(len(b)) entries."""
    import struct

    def table(cbody: int, cend: int, name: str, header: int, entry: int):
        if cbody + header > cend:
            raise ValueError(f"mp4 {name} box too short for its header")
        (count,) = struct.unpack_from(">I", b, cbody + header - 4)
        if cbody + header + entry * count > cend:
            raise ValueError(f"mp4 {name} count overruns its box")
        return count

    out: dict = {}
    for btype, cbody, cend in _mp4_boxes(b, body, bend):
        if btype == b"stsd":
            count = table(cbody, cend, "stsd", 8, 0)
            if count < 1:
                raise ValueError("mp4 stsd has no sample entries")
            for etype, ebody, eend in _mp4_boxes(b, cbody + 8, cend):
                fmt = etype.decode("ascii", "replace")
                if etype != b"raw ":
                    raise NotImplementedError(
                        f"no frame decoder for codec {fmt!r}; only "
                        "uncompressed 'raw ' RGB tracks decode without "
                        "native codecs — install one and inject"
                    )
                if eend - ebody < 76:  # VideoSampleEntry body minimum
                    raise ValueError("mp4 stsd sample entry truncated")
                w, h = struct.unpack_from(">HH", b, ebody + 24)
                (depth,) = struct.unpack_from(">H", b, ebody + 74)
                out["entry"] = {"format": fmt, "width": w, "height": h,
                                "depth": depth}
                break
        elif btype == b"stts":
            count = table(cbody, cend, "stts", 8, 8)
            out["stts"] = [
                struct.unpack_from(">II", b, cbody + 8 + 8 * i)
                for i in range(count)
            ]
        elif btype == b"stsz":
            if cbody + 12 > cend:
                raise ValueError("mp4 stsz box too short for its header")
            size, count = struct.unpack_from(">II", b, cbody + 4)
            if size:
                # constant-size table carries no entries, so the box
                # length can't bound count — cap at the file size (every
                # decoded frame needs >= 1 mdat byte) to keep hostile
                # counts from allocating unbounded lists
                if count > len(b):
                    raise ValueError("mp4 stsz count exceeds file size")
                out["sizes"] = [size] * count
            else:
                if cbody + 12 + 4 * count > cend:
                    raise ValueError("mp4 stsz count overruns its box")
                out["sizes"] = list(
                    struct.unpack_from(f">{count}I", b, cbody + 12)
                )
        elif btype == b"stsc":
            count = table(cbody, cend, "stsc", 8, 12)
            out["stsc"] = [
                struct.unpack_from(">III", b, cbody + 8 + 12 * i)
                for i in range(count)
            ]
        elif btype == b"stco":
            count = table(cbody, cend, "stco", 8, 4)
            out["stco"] = list(
                struct.unpack_from(f">{count}I", b, cbody + 8)
            )
    return out


def decode_mp4_frames(b: bytes) -> dict:
    """FRAME-LEVEL video decode for uncompressed ISO-BMFF tracks — the
    sample-table hop ffmpeg does before the codec: walk
    ``moov→trak→mdia→minf→stbl``, locate every sample through
    ``stsc``/``stco``/``stsz``, timestamp it through ``stts``, and slice
    the raw RGB24 frame bytes out of the file.  Compressed codecs
    (h264/vp9/…) still need a native decoder injected — that path raises
    ``NotImplementedError`` from the ``stsd`` check, the package's
    documented codec-injection contract.

    Returns ``{width, height, depth, frames: [(pts_units, bytes)]}``."""
    b = bytes(b)
    stbl = None
    for btype, body, bend in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in _mp4_boxes(b, body, bend):
            if ctype != b"trak":
                continue
            for mtype, mbody, mend in _mp4_boxes(b, cbody, cend):
                if mtype != b"mdia":
                    continue
                for ntype, nbody, nend in _mp4_boxes(b, mbody, mend):
                    if ntype != b"minf":
                        continue
                    for stype, sbody, send in _mp4_boxes(b, nbody, nend):
                        if stype == b"stbl":
                            stbl = _stbl_walk(b, sbody, send)
                            break
    if stbl is None:
        raise ValueError("mp4 missing moov/trak/mdia/minf/stbl")
    for key in ("entry", "stts", "sizes", "stsc", "stco"):
        if key not in stbl:
            raise ValueError(f"mp4 stbl missing {key} table")
    sizes = stbl["sizes"]
    # expand stts (sample_count, delta) runs into per-sample pts
    pts, t = [], 0
    for count, delta in stbl["stts"]:
        for _ in range(count):
            pts.append(t)
            t += delta
    if len(pts) != len(sizes):
        raise ValueError("mp4 stts/stsz sample counts disagree")
    # map samples to absolute offsets: stsc runs give samples per chunk,
    # stco gives each chunk's file offset; samples are contiguous inside
    # a chunk (ISO 14496-12 §8.7.4/8.7.5)
    stsc, stco = stbl["stsc"], stbl["stco"]
    offsets: list[int] = []
    sample = 0
    for run_idx, (first_chunk, per_chunk, _desc) in enumerate(stsc):
        last_chunk = (
            stsc[run_idx + 1][0] - 1 if run_idx + 1 < len(stsc) else len(stco)
        )
        # Chunk indices are 1-based into stco (ISO 14496-12 §8.7.4);
        # hostile tables must fail the ValueError contract, not index
        # stco out of range (successor first_chunk > len(stco)+1) or
        # silently read stco[-1] (first_chunk == 0) — ADVICE r08.
        if first_chunk < 1 or last_chunk > len(stco):
            raise ValueError("mp4 stsc chunk run outside stco bounds")
        for chunk in range(first_chunk, last_chunk + 1):
            pos = stco[chunk - 1]
            for _ in range(per_chunk):
                if sample >= len(sizes):
                    break
                offsets.append(pos)
                pos += sizes[sample]
                sample += 1
    if len(offsets) != len(sizes):
        raise ValueError("mp4 stsc/stco cover wrong sample count")
    frames = []
    for i, (off, size) in enumerate(zip(offsets, sizes)):
        if off + size > len(b):
            raise ValueError(f"mp4 sample {i} overruns file")
        frames.append((pts[i], b[off : off + size]))
    e = stbl["entry"]
    return {
        "width": e["width"],
        "height": e["height"],
        "depth": e["depth"],
        "frames": frames,
    }


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-payload metadata, vectorised per batch."""
    for pdf in batches:
        lengths = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_length": lengths,
                "content_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "fake_width": (lengths % 640).astype("int32"),
                "fake_height": (lengths * 7 % 480).astype("int32"),
            }
        )


def extract_metadata(mm: DataFrame) -> DataFrame:
    """Payload → typed metadata via Arrow-batched mapInPandas."""
    return mm.mapInPandas(_meta_batches, schema=META_SCHEMA)


def _frame_batches(n_frames: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_md5": [], "frame_bytes": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step] if i < n_frames - 1 else b[(n_frames - 1) * step :]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return gen


def frame_sample(mm: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling: 1 payload row → n_frames rows (row-expanding
    mapInPandas — the shape a real keyframe sampler has)."""
    return mm.mapInPandas(_frame_batches(n_frames), schema=FRAME_SCHEMA)


def _feature_batches(dim: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                # Deterministic fake embedding: md5-seeded, unit-normalised —
                # stands in for a real vision/audio encoder.
                seed = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype("float32")
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return gen


def extract_features(mm: DataFrame, dim: int = 64) -> DataFrame:
    """Payload → fake embedding (deterministic stand-in for a real encoder);
    output feeds straight into the similarity operators."""
    return mm.mapInPandas(_feature_batches(dim), schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


@register(
    "multimodal_meta",
    oracle=f"""
    SELECT doc_id,
           ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_length,
           md5(text) AS content_md5,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS fake_height
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed metadata through the Pandas-UDF path; the
    oracle recomputes the same facts SQL-side, proving the Arrow batch
    plumbing (schema, types, values) end to end."""
    return extract_metadata(multimodal_table(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle="""
    -- fixture text is ASCII, so VARCHAR substrings slice the same bytes the
    -- Pandas UDF slices (DuckDB has no BLOB substring)
    WITH f AS (
        SELECT doc_id, text AS b, length(text) AS n,
               greatest(length(text) // 4, 1) AS step
        FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(CASE WHEN i < 3 THEN substring(b, i*step + 1, step)
                    ELSE substring(b, 3*step + 1, greatest(n - 3*step, 0)) END) AS frame_md5,
           CAST(CASE WHEN i < 3 THEN least(step, greatest(n - i*step, 0))
                     ELSE greatest(n - 3*step, 0) END AS BIGINT) AS frame_bytes
    FROM f, UNNEST([0, 1, 2, 3]) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampler (4 'frames' per payload) through
    mapInPandas, oracle-checked byte-for-byte via md5 per chunk."""
    return frame_sample(multimodal_table(spark, sf_dir), n_frames=4)


@register(
    "multimodal_features",
    # The encoder output is md5-seeded numpy (not SQL), so the STRICT row
    # is the contract certificate: one feature row per document, the
    # declared dimension, unit L2 norm (the invariant the cosine
    # similarity stack depends on).  A wrong dim, a lost doc, or a broken
    # normalisation hash-mismatches the oracle.
    oracle="""
    SELECT doc_id,
           CAST(64 AS INT) AS dim,
           TRUE AS unit_norm
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict certificate tier of :func:`extract_features` (the VERDICT
    r08 task-3 pattern): payload → deterministic fake embedding (the real
    encoder slot), with the registered row carrying the per-doc dimension
    and a unit-L2-norm boolean — the properties the downstream similarity
    operators assume.  The raw feature table stays available via
    :func:`extract_features`."""
    feats = extract_features(multimodal_table(spark, sf_dir))
    sq = F.aggregate(
        "feature",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return feats.select(
        "doc_id",
        F.size("feature").alias("dim"),
        (F.abs(sq - F.lit(1.0)) < F.lit(1e-4)).alias("unit_norm"),
    ).orderBy("doc_id")


DECODE_SCHEMA = (
    "doc_id long, media_type string, kind string, width int, height int, "
    "channels int, sample_rate int, n_samples long, duration_sec double"
)


def synth_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-format media fixtures: per-doc parameters derived from doc_id,
    then ACTUAL PNG/WAV/MP4 container bytes synthesized in Arrow batches —
    doc_id % 3 cycles image → audio → video.  The parameter formulas are
    the contract the decode oracle recomputes in SQL."""
    from ..session import spread

    # r11: spread before the Python boundary — codec synthesis (and every
    # decode stage downstream of this table) otherwise runs in ONE Python
    # worker off the single-file scan.
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mtypes = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                r = d % 3
                if r == 0:
                    payloads.append(
                        synthesize_png(d % 64 + 1, d * 3 % 48 + 1, seed=d)
                    )
                    mtypes.append("image/png")
                elif r == 1:
                    payloads.append(
                        synthesize_wav(
                            (d // 2) % 2 + 1,
                            8000 * ((d // 3) % 3 + 1),
                            d % 256 + 16,
                            seed=d,
                        )
                    )
                    mtypes.append("audio/wav")
                else:
                    payloads.append(
                        synthesize_mp4(
                            d % 128 + 16,
                            d * 5 % 96 + 16,
                            d % 5000 + 100,
                            1000 * (d % 7 + 1),
                            seed=d,
                        )
                    )
                    mtypes.append("video/mp4")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": mtypes, "payload": payloads}
            )

    return docs.mapInPandas(gen, schema="doc_id long, media_type string, payload binary")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real container parsing per payload, typed
    columns out (image fields null for audio rows and vice versa)."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "media_type", "kind", "width", "height",
            "channels", "sample_rate", "n_samples", "duration_sec",
        )}
        for d, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
            p = decode_media(payload, mt)
            out["doc_id"].append(d)
            out["media_type"].append(mt)
            out["kind"].append(p["kind"])
            out["width"].append(p.get("width"))
            out["height"].append(p.get("height"))
            out["channels"].append(p.get("channels"))
            out["sample_rate"].append(p.get("sample_rate"))
            out["n_samples"].append(p.get("n_samples"))
            out["duration_sec"].append(p.get("duration_sec"))
        pdf_out = pd.DataFrame(out)
        for c, t in (
            ("width", "Int32"), ("height", "Int32"), ("channels", "Int32"),
            ("sample_rate", "Int32"), ("n_samples", "Int64"),
        ):
            pdf_out[c] = pdf_out[c].astype(t)
        yield pdf_out


def decode_table(mm: DataFrame) -> DataFrame:
    """payload → decoded typed properties via Arrow-batched mapInPandas."""
    return mm.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CASE doc_id % 3 WHEN 0 THEN CAST(doc_id % 64 + 1 AS INT)
                WHEN 2 THEN CAST(doc_id % 128 + 16 AS INT) END AS width,
           CASE doc_id % 3 WHEN 0 THEN CAST(doc_id * 3 % 48 + 1 AS INT)
                WHEN 2 THEN CAST(doc_id * 5 % 96 + 16 AS INT) END AS height,
           CASE WHEN doc_id % 3 = 1 THEN CAST((doc_id // 2) % 2 + 1 AS INT) END AS channels,
           CASE WHEN doc_id % 3 = 1 THEN CAST(8000 * ((doc_id // 3) % 3 + 1) AS INT) END AS sample_rate,
           CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 256 + 16 AS BIGINT) END AS n_samples,
           CASE doc_id % 3
                WHEN 1 THEN CAST(doc_id % 256 + 16 AS DOUBLE)
                            / (8000 * ((doc_id // 3) % 3 + 1))
                WHEN 2 THEN CAST(doc_id % 5000 + 100 AS DOUBLE)
                            / (1000 * (doc_id % 7 + 1)) END AS duration_sec
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end real-codec round trip: synthesize actual PNG/WAV/MP4
    container bytes with doc_id-derived parameters, parse them back with
    the pure-stdlib decoders (CRC-verified for PNG, box-walked for MP4),
    and let the oracle recompute the planted parameters in SQL — a hash
    mismatch means the encoder or parser corrupted a single field
    anywhere in the corpus."""
    return decode_table(synth_media_table(spark, sf_dir))


#: Fixed thumbnail geometry for the resize operator.
RESIZE_W, RESIZE_H = 16, 12


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(doc_id % 64 + 1 AS INT) AS width,
           CAST(doc_id * 3 % 48 + 1 AS INT) AS height,
           CAST({RESIZE_W} AS INT) AS out_w,
           CAST({RESIZE_H} AS INT) AS out_h,
           CAST(SUM(
               ((doc_id
                 + ((x2 * (doc_id % 64 + 1)) // {RESIZE_W}) * 7
                 + ((y2 * (doc_id * 3 % 48 + 1)) // {RESIZE_H}) * 13) % 256)
               * (y2 * {RESIZE_W} + x2 + 1)
           ) AS BIGINT) AS checksum
    FROM documents,
         unnest(generate_series(0, {RESIZE_W - 1})) AS tx(x2),
         unnest(generate_series(0, {RESIZE_H - 1})) AS ty(y2)
    WHERE doc_id % 3 = 0
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize through the REAL pixel path: zlib-inflate the PNG,
    unfilter scanlines (full five-filter spec), nearest-neighbor resample
    to a 16×12 thumbnail, and emit a position-weighted pixel checksum.
    The oracle recomputes the checksum from the planted pixel formula and
    the same integer resample mapping — a hash mismatch catches a
    one-pixel error anywhere in inflate/unfilter/resample."""
    mm = synth_media_table(spark, sf_dir).filter(F.col("media_type") == "image/png")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "out_w": [], "out_h": [], "checksum": [],
        }
        for pdf in batches:
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_png_pixels(bytes(payload))
                small = resize_nearest(px, w, h, RESIZE_W, RESIZE_H)
                out["doc_id"].append(d)
                out["width"].append(w)
                out["height"].append(h)
                out["out_w"].append(RESIZE_W)
                out["out_h"].append(RESIZE_H)
                out["checksum"].append(
                    sum(p * (i + 1) for i, p in enumerate(small))
                )
        yield pd.DataFrame(out)

    return mm.mapInPandas(
        gen,
        schema="doc_id long, width int, height int, out_w int, out_h int, checksum long",
    ).orderBy("doc_id")


@register(
    "multimodal_video_frames",
    oracle="""
    WITH v AS (
        SELECT doc_id,
               doc_id % 16 + 4 AS w,
               (doc_id * 3) % 12 + 4 AS h,
               doc_id % 5 + 2 AS nf
        FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
        SELECT v.doc_id, v.w, v.h, fx.f AS frame_idx
        FROM v, unnest(generate_series(0, v.nf - 1)) AS fx(f)
    )
    SELECT f.doc_id,
           CAST(f.frame_idx AS BIGINT) AS frame_idx,
           CAST(f.frame_idx * 100 AS BIGINT) AS pts_units,
           CAST(f.w AS INT) AS width,
           CAST(f.h AS INT) AS height,
           CAST(f.w * f.h * 3 AS BIGINT) AS n_bytes,
           CAST(SUM(
               ((f.doc_id * 31 + f.frame_idx * 101 + bx.i * 7) % 256)
               * (bx.i + 1)
           ) AS BIGINT) AS checksum
    FROM f, unnest(generate_series(0, f.w * f.h * 3 - 1)) AS bx(i)
    GROUP BY f.doc_id, f.frame_idx, f.w, f.h
    ORDER BY f.doc_id, f.frame_idx
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAME-LEVEL video decode end-to-end (VERDICT r07 task 3 — the one
    declared native-codec gap): synthesize real ISO-BMFF files carrying a
    complete uncompressed-RGB sample table (:func:`synthesize_mp4_rawvideo`),
    decode every frame back through the stdlib sample-table walk
    (:func:`decode_mp4_frames` — stsd/stts/stsc/stco/stsz, the same hop
    ffmpeg makes before the codec), and emit one row per frame with a
    position-weighted pixel checksum.  The oracle recomputes the planted
    per-frame pixel formula in closed-form SQL — a hash mismatch catches
    a one-byte error in any frame's offset, size, timestamp, or content
    anywhere in the corpus.  Compressed codecs remain the documented
    injection point (``stsd`` raises ``NotImplementedError``)."""
    from ..session import spread

    # r11: spread before the Python boundary (32 mp4 synth+decode workers).
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") % 3 == 2
        ),
        "doc_id",
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "pts_units": [],
                "width": [], "height": [], "n_bytes": [], "checksum": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                payload = synthesize_mp4_rawvideo(
                    d % 16 + 4, d * 3 % 12 + 4, d % 5 + 2, seed=d
                )
                dec = decode_mp4_frames(payload)
                for idx, (pts, fb) in enumerate(dec["frames"]):
                    out["doc_id"].append(d)
                    out["frame_idx"].append(idx)
                    out["pts_units"].append(pts)
                    out["width"].append(dec["width"])
                    out["height"].append(dec["height"])
                    out["n_bytes"].append(len(fb))
                    out["checksum"].append(
                        sum(p * (i + 1) for i, p in enumerate(fb))
                    )
            pdf_out = pd.DataFrame(out)
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            yield pdf_out

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, frame_idx long, pts_units long, width int, "
            "height int, n_bytes long, checksum long"
        ),
    ).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_audio_stats",
    oracle="""
    WITH p AS (
        SELECT doc_id, (doc_id // 2) % 2 + 1 AS ch, doc_id % 256 + 16 AS n
        FROM documents WHERE doc_id % 3 = 1
    ),
    s AS (
        SELECT doc_id, ch, ((doc_id * 31 + i * 257) % 65536) - 32768 AS v
        FROM p, unnest(generate_series(0, n - 1)) AS t(i)
    )
    SELECT doc_id,
           CAST(MAX(ch) * COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak,
           CAST(MAX(ch) * SUM(ABS(v)) AS BIGINT) AS sum_abs,
           CAST(MAX(ch) * SUM(v * v) AS BIGINT) AS sum_sq
    FROM s GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction through the REAL PCM path: struct-unpack
    the int16 data chunk, compute exact-integer loudness statistics
    (sample count, peak, Σ|v|, Σv² — all order-independent ints, so the
    SQL oracle matches bit-for-bit with no float-accumulation hazard).
    RMS/dBFS are one float expression away downstream."""
    mm = synth_media_table(spark, sf_dir).filter(F.col("media_type") == "audio/wav")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "n_samples": [], "peak": [], "sum_abs": [], "sum_sq": [],
        }
        for pdf in batches:
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, samples = decode_wav_samples(bytes(payload))
                out["doc_id"].append(d)
                out["n_samples"].append(len(samples))
                out["peak"].append(max(abs(v) for v in samples))
                out["sum_abs"].append(sum(abs(v) for v in samples))
                out["sum_sq"].append(sum(v * v for v in samples))
        yield pd.DataFrame(out)

    return mm.mapInPandas(
        gen,
        schema="doc_id long, n_samples long, peak long, sum_abs long, sum_sq long",
    ).orderBy("doc_id")


def read_media_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest a directory of raw media files as a multimodal table via
    Spark's ``binaryFile`` source: one row per file with (path, length,
    modificationTime, content).  The natural on-ramp from an object-store
    media dump into the payload/metadata model above — pair with
    :func:`extract_metadata` / :func:`extract_features` downstream.

    At scale: ``binaryFile`` splits by file, so millions of small media
    files want a compaction pass (this table written back as parquet with
    the payload column) before repeated processing."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.col("path"),
        F.col("length").alias("byte_length"),
        F.col("content").alias("payload"),
        F.element_at(F.split(F.col("path"), "\\."), -1).alias("extension"),
    )


# ---------------------------------------------------------------------------
# perceptual image near-dup (dHash + banded LSH)
# ---------------------------------------------------------------------------

#: dHash grid: 9×8 samples → 64 horizontal-gradient bits.
DHASH_W, DHASH_H = 9, 8
#: Pairs at hamming distance ≤ this are near-duplicates.
DHASH_MAX_HAMMING = 6
#: LSH bands over the 64-bit hash (4 × 16 bits): a pair with ≤6 differing
#: bits almost surely leaves one band untouched (planted-recall pytest).
DHASH_BANDS = 4


def dhash64(payload: bytes) -> int:
    """Perceptual difference hash: decode, nearest-neighbor resize to
    9×8, emit 1 bit per horizontal neighbor comparison (px[x] > px[x+1])
    — row-major, MSB first.  Tolerant of re-encoding and small local
    edits: only gradients at the 72 sample points matter."""
    w, h, px = decode_png_pixels(payload)
    small = resize_nearest(px, w, h, DHASH_W, DHASH_H)
    bits = 0
    for y in range(DHASH_H):
        row = small[y * DHASH_W : (y + 1) * DHASH_W]
        for x in range(DHASH_W - 1):
            bits = (bits << 1) | (1 if row[x] > row[x + 1] else 0)
    # two's-complement into int64 for a BIGINT column
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_neardup_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived image fixture with PLANTED near-duplicates: one textured
    PNG per even doc_id; ids ≡ 18 (mod 32) re-render their source image
    (id − 16: same size, same seed — and itself never perturbed, so the
    pairing doesn't chain) with ONE pixel flipped — a true perceptual
    near-dup whose ground-truth pairing is (id−16, id)."""
    from ..session import spread

    # r11: spread before the Python boundary (32 PNG-render workers).
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2:
                    continue
                src = d - 16 if (d % 32 == 18 and d >= 16) else d
                w, hh = src % 32 + 16, src * 3 % 32 + 16
                png = synthesize_png(w, hh, seed=src, texture=True)
                if src != d:
                    ww, hhh, px = decode_png_pixels(png)
                    px = bytearray(px)
                    px[0] = (px[0] + 128) % 256  # one-pixel edit
                    raw = bytearray()
                    for y in range(hhh):
                        raw.append(0)
                        raw.extend(px[y * ww : (y + 1) * ww])

                    def chunk(ctype: bytes, body: bytes) -> bytes:
                        return (
                            struct.pack(">I", len(body))
                            + ctype
                            + body
                            + struct.pack(
                                ">I", zlib.crc32(ctype + body) & 0xFFFFFFFF
                            )
                        )

                    png = (
                        _PNG_SIG
                        + chunk(
                            b"IHDR",
                            struct.pack(">IIBBBBB", ww, hhh, 8, 0, 0, 0, 0),
                        )
                        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
                        + chunk(b"IEND", b"")
                    )
                ids.append(d)
                payloads.append(png)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.mapInPandas(gen, schema="doc_id long, payload binary")


@register("multimodal_image_neardup")  # rows-only: codec lives in Python
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs: dHash per image (Arrow batches,
    bytes never become Python rows outside the codec), 4×16-bit banded
    LSH buckets from ONE groupBy-free explode, candidate pairs only
    within a bucket, exact hamming verify JVM-side (`bit_count(h1^h2)`).

    Scale: the image corpus is hashed once (64 bits/image survive);
    banding bounds candidates exactly like dedup.py's SimHash tier; the
    verify join carries two BIGINTs per side.  Pairs at hamming ≤ 6 (the
    textured fixture shows borderline structural collisions at 8-10).
    """
    imgs = image_neardup_table(spark, sf_dir)

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "h": [dhash64(p) for p in pdf["payload"]],
                }
            )

    hashed = imgs.mapInPandas(
        hash_batches, schema="doc_id long, h long"
    ).localCheckpoint(eager=False)
    bands = hashed.select(
        "doc_id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("h"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(DHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "h", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a = bands.toDF("doc_a", "h_a", "band", "val")
    b = bands.toDF("doc_b", "h_b", "band", "val")
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= DHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )
