"""Unit tests for the pure-stdlib PNG/WAV codecs (operators/codecs.py).

The registered round-trip queries only exercise filter-0 grayscale
PNGs (our encoder's output); these tests pin the decoder against the
rest of the spec surface it claims: all five scanline filters, RGB,
chunk CRC validation, and (when PIL is installed) parity with PIL.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from p4_mapreduce_spark.operators.codecs import (
    _PNG_MAGIC,
    _chunk,
    png_decode,
    png_encode_gray,
    png_encode_rgb,
    wav_decode,
    wav_encode_pcm16,
)


def _make_png(pixels: bytes, width: int, height: int, channels: int,
              filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types,
    applying the spec's forward-filter math so the decoder must undo it."""
    bpp = channels
    stride = width * bpp
    assert len(pixels) == stride * height and len(filters) == height

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    for r, ftype in enumerate(filters):
        line = pixels[r * stride:(r + 1) * stride]
        prev = pixels[(r - 1) * stride: r * stride] if r else bytes(stride)
        raw.append(ftype)
        for i, x in enumerate(line):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                f = x
            elif ftype == 1:
                f = x - a
            elif ftype == 2:
                f = x - b
            elif ftype == 3:
                f = x - (a + b) // 2
            elif ftype == 4:
                f = x - paeth(a, b, c)
            raw.append(f & 0xFF)
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


PIXELS_4x3 = bytes(range(1, 13))  # 4 wide, 3 tall, gray


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_every_filter_type_decodes(ftype):
    png = _make_png(PIXELS_4x3, 4, 3, 1, [ftype] * 3)
    w, h, c, px = png_decode(png)
    assert (w, h, c) == (4, 3, 1)
    assert px == PIXELS_4x3


def test_png_mixed_filters_decode():
    png = _make_png(PIXELS_4x3, 4, 3, 1, [1, 4, 3])
    assert png_decode(png)[3] == PIXELS_4x3


def test_png_rgb_decode():
    pixels = bytes((i * 37 + 11) % 256 for i in range(2 * 2 * 3))
    png = _make_png(pixels, 2, 2, 3, [4, 2])
    w, h, c, px = png_decode(png)
    assert (w, h, c) == (2, 2, 3)
    assert px == pixels


def test_png_encode_decode_roundtrip_arbitrary_bytes():
    for n in (1, 31, 32, 33, 1000):
        data = bytes((i * 131 + 7) % 256 for i in range(n))
        png = png_encode_gray(data, 32)
        w, h, c, px = png_decode(png)
        assert w == 32 and c == 1 and h == (n + 31) // 32
        assert px[:n] == data
        assert all(b == 0 for b in px[n:])  # declared zero padding


def test_png_crc_corruption_raises():
    png = bytearray(png_encode_gray(b"hello world", 4))
    png[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(png))


def test_png_rejects_non_png():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"GIF89a....")


def test_png_pil_parity_when_installed():
    pytest.importorskip("PIL")
    from p4_mapreduce_spark.operators.codecs import _png_decode_pure

    data = bytes((i * 73) % 256 for i in range(257))
    png = png_encode_gray(data, 16)
    assert png_decode(png) == _png_decode_pure(png)


def test_png_rgb_encode_decode_roundtrip_arbitrary_bytes():
    # boundary cases around the 48-byte stride (16 px * 3 channels)
    for n in (1, 47, 48, 49, 1000):
        data = bytes((i * 131 + 7) % 256 for i in range(n))
        png = png_encode_rgb(data, 16)
        w, h, c, px = png_decode(png)
        assert w == 16 and c == 3 and h == (n + 47) // 48
        assert px[:n] == data
        assert all(b == 0 for b in px[n:])


def test_png_rgb_encoder_uses_adaptive_filters():
    """The RGB encoder must actually emit non-zero filter types on
    structured data (a smooth gradient makes Sub/Up/Paeth win the
    min-sum-of-absolute-differences heuristic) — otherwise the
    'exercises all filters on encode' claim is hollow."""
    w = 16
    # smooth horizontal+vertical gradient, 10 rows
    data = bytes(
        (3 * x + 7 * y) % 256 for y in range(10) for x in range(w * 3)
    )
    png = png_encode_rgb(data, w)
    # peel the IDAT stream back out and read the filter-type bytes
    pos = 8
    idat = bytearray()
    while pos < len(png):
        (length,) = struct.unpack_from(">I", png, pos)
        ctype = png[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += png[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    filters = {raw[r * (stride + 1)] for r in range(10)}
    assert filters - {0}, f"only filter 0 used: {filters}"
    # and the adaptively-filtered image still round-trips exactly
    assert png_decode(png)[3] == data


def test_png_rgb_pil_parity_when_installed():
    pytest.importorskip("PIL")
    from p4_mapreduce_spark.operators.codecs import _png_decode_pure

    data = bytes((i * 73) % 256 for i in range(300))
    png = png_encode_rgb(data, 8)
    assert png_decode(png) == _png_decode_pure(png)


def test_wav_roundtrip_even_and_odd():
    for n in (2, 15, 16, 4001):
        data = bytes((i * 29 + 3) % 256 for i in range(n))
        wav = wav_encode_pcm16(data, sample_rate=16000)
        rate, ch, frames, pcm = wav_decode(wav)
        assert (rate, ch) == (16000, 1)
        assert frames == (n + 1) // 2
        assert pcm[:n] == data


# ---------------------------------------------------------------------------
# Baseline JPEG (r7): coefficient-exact roundtrip through the bitstream
# ---------------------------------------------------------------------------


def test_jpeg_decode_equals_reference():
    """decode(encode(x)) must equal the bitstream-free reference
    reconstruction bit-for-bit — the lossy codec's replacement for the
    PNG byte-exact roundtrip (exactness lives at the integer
    quantized-coefficient level; both paths share one IDCT kernel)."""
    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode_gray,
        jpeg_reference_reconstruct,
    )

    cases = [
        b"hello jpeg world " * 23,  # text-like
        bytes(range(256)) * 5,  # ramps crossing block edges
        b"\xff" * 300,  # forces 0xFF stuffing paths
        b"\x00" * 300,  # all-zero AC (EOB-heavy)
        bytes([(i * 37 + i * i * 11) % 256 for i in range(2000)]),  # busy
        b"x",  # single pixel
        b"",  # empty -> 1x1 per the PNG convention
    ]
    for raw in cases:
        jpg = jpeg_encode_gray(raw, 72)
        assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
        w, h, c, px = jpeg_decode(jpg)
        assert (w, c) == (72, 1) or raw == b"" or len(raw) == 1
        assert px == jpeg_reference_reconstruct(raw, 72), len(raw)


def test_jpeg_zrl_and_wide_runs():
    """A block with >16 zero AC coefficients between nonzeros forces
    ZRL (the 0xF0 run-extension symbol) through both coder sides."""
    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode_gray,
        jpeg_reference_reconstruct,
    )

    # smooth gradient rows: tiny high-frequency content, long AC runs
    raw = bytes([min(255, y) for y in range(64)] * 24)
    jpg = jpeg_encode_gray(raw, 8)
    _w, _h, _c, px = jpeg_decode(jpg)
    assert px == jpeg_reference_reconstruct(raw, 8)


def test_jpeg_lossy_but_close():
    """Sanity on the lossy claim itself: reconstruction error on a
    smooth ramp stays small (the quantizer's job), never exact-zero
    guaranteed — this is what distinguishes the JPEG contract from
    PNG's byte roundtrip."""
    import numpy as np

    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode_gray,
    )

    raw = bytes([(x * 2) % 256 for x in range(72 * 8)])
    _w, _h, _c, px = jpeg_decode(jpeg_encode_gray(raw, 72))
    a = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
    b = np.frombuffer(px[: len(raw)], dtype=np.uint8).astype(np.int32)
    mae = float(np.abs(a - b).mean())
    assert mae < 24.0, mae  # quantized DCT of a sawtooth stays close


def test_decode_image_jpeg_path():
    """multimodal.decode_image routes JPEG payloads through the real
    decoder now — only video remains env-gated."""
    from p4_mapreduce_spark.operators.codecs import jpeg_encode_gray
    from p4_mapreduce_spark.operators.multimodal import decode_image

    raw = b"a jpeg routed payload " * 9
    feats = decode_image(jpeg_encode_gray(raw, 72))
    assert feats[0] > 0


def test_phash_on_jpeg_assets():
    """dHash over JPEG-decoded pixels == dHash over the reference
    reconstruction (coefficient-exactness makes perceptual hashing on
    the lossy codec deterministic), and near-identical sources stay
    near in Hamming distance after the lossy roundtrip."""
    import hashlib

    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode_gray,
        jpeg_reference_reconstruct,
    )

    def dhash(px: bytes) -> int:
        grid = (px + b"\x00" * 72)[:72]
        h = 0
        for r in range(8):
            for c in range(8):
                if grid[r * 9 + c] < grid[r * 9 + c + 1]:
                    h |= 1 << (r * 8 + c)
        return h

    base = ("the quick brown fox jumps over the lazy dog " * 6).encode()
    near = bytearray(base)
    near[100] ^= 0x01  # one-bit source perturbation
    hashes = {}
    for name, raw in [("base", base), ("near", bytes(near))]:
        _w, _h, _c, px = jpeg_decode(jpeg_encode_gray(raw, 72))
        ref = jpeg_reference_reconstruct(raw, 72)
        assert px == ref
        hashes[name] = dhash(px[: len(raw)])
    ham = bin(hashes["base"] ^ hashes["near"]).count("1")
    assert ham <= 8, ham  # perceptually near after the lossy roundtrip
    # determinism: re-encoding yields the identical hash
    _w, _h, _c, px2 = jpeg_decode(jpeg_encode_gray(base, 72))
    assert dhash(px2[: len(base)]) == hashes["base"]


def test_jpeg_color_roundtrip_exact():
    """Color (4:2:0 YCbCr) decode == reference reconstruction
    byte-for-byte across geometries — the grayscale coefficient-
    exactness invariant carried to three components."""
    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode_color,
        jpeg_encode_rgb,
        jpeg_reference_reconstruct_rgb,
    )

    cases = [
        (b"", 4),  # min geometry, zero-padded
        (b"\x00" * 300, 10),  # flat black
        (bytes(range(256)) * 9, 17),  # ramps, odd width
        (b"an rgb payload spanning several MCU rows " * 50, 72),
        (bytes((i * 7 + 13) % 256 for i in range(3 * 72 * 33)), 72),
    ]
    for data, w in cases:
        jpg = jpeg_encode_rgb(data, w)
        assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
        dw, dh, c, rgb = jpeg_decode_color(jpg)
        assert (dw, c) == (w, 3)
        assert rgb == jpeg_reference_reconstruct_rgb(data, w), (len(data), w)


def test_jpeg_color_headers_and_variant_gates():
    """The color stream carries both Annex-K QTs (ids 0/1), four
    Huffman tables, and a 3-component 4:2:0 SOF0; the decoder rejects
    what it does not implement rather than mis-decoding."""
    import pytest

    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode,
        jpeg_decode_color,
        jpeg_encode_gray,
        jpeg_encode_rgb,
    )

    jpg = jpeg_encode_rgb(b"rgb" * 200, 12)
    sof = jpg.index(b"\xff\xc0")
    assert jpg[sof + 9] == 3  # 3 components
    assert jpg[sof + 11] == 0x22  # Y sampled 2x2
    # the grayscale decoder must refuse the 3-component stream
    with pytest.raises(NotImplementedError):
        jpeg_decode(jpg)
    # and the color decoder must refuse a grayscale stream
    with pytest.raises((NotImplementedError, ValueError)):
        jpeg_decode_color(jpeg_encode_gray(b"gray" * 100, 20))


def test_jpeg_color_is_perceptually_faithful():
    """Lossy but close: mean absolute error per channel stays small on
    smooth content (sanity that the YCbCr + subsample path is wired
    right, not just self-consistent)."""
    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode_color,
        jpeg_encode_rgb,
    )

    w, h = 48, 32
    data = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 5) % 256, (y * 7) % 256, ((x + y) * 3) % 256)
    )
    _dw, _dh, _c, rgb = jpeg_decode_color(jpeg_encode_rgb(data, w))
    mae = sum(abs(a - b) for a, b in zip(rgb, data)) / len(data)
    assert mae < 26.0, mae


def test_jpeg_property_roundtrips():
    """Property sweep: random payloads and widths — both codecs'
    decode must equal their reference reconstruction bit-for-bit
    (hypothesis-style but with a fixed LCG so the corpus is stable
    across runs; failures reproduce by seed index)."""
    from p4_mapreduce_spark.operators.codecs import (
        jpeg_decode,
        jpeg_decode_color,
        jpeg_encode_gray,
        jpeg_encode_rgb,
        jpeg_reference_reconstruct,
        jpeg_reference_reconstruct_rgb,
    )

    state = 0x243F6A8885A308D3  # fixed seed: pi digits

    def rnd(n: int) -> bytes:
        nonlocal state
        out = bytearray()
        for _ in range(n):
            state = (state * 6364136223846793005 + 1442695040888963407) % (
                1 << 64
            )
            out.append((state >> 33) & 0xFF)
        return bytes(out)

    for i in range(12):
        w = 1 + (i * 7) % 40
        n = (i * i * 131) % 900
        data = rnd(n)
        g = jpeg_encode_gray(data, w)
        _gw, _gh, _gc, px = jpeg_decode(g)
        assert px == jpeg_reference_reconstruct(data, w), (i, "gray")
        c = jpeg_encode_rgb(data, w)
        _cw, _ch, _cc, rgb = jpeg_decode_color(c)
        assert rgb == jpeg_reference_reconstruct_rgb(data, w), (i, "color")
