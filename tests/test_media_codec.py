"""Pure-stdlib PNG/WAV codecs (VERDICT r3 #3: FakeCodec demoted to tests).

The PNG golden below is constructed BYTE BY BYTE in the test (chunks, CRCs,
zlib scanlines) — not via sparkft's own encoder — and its expected pixel
array is hand-computed from the RFC 2083 filter definitions, so the decoder
is checked against the spec, not against itself. A differential test then
cross-checks the vectorized unfilter against a naive per-byte reference on
random images over all five filter types.
"""

import struct
import zlib

import numpy as np
import pytest

from sparkft.media_codec import (
    MediaFormatError,
    PNG_MAGIC,
    StdlibCodec,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def _png(width, height, color_type, scanlines: bytes, plte: bytes = b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")


def test_png_golden_all_filter_types():
    """2x4 RGB image exercising filters Sub/Up/Average/Paeth; expected
    pixels hand-computed from the RFC 2083 definitions."""
    scan = (
        b"\x01" + bytes([10, 20, 30, 5, 5, 5])   # Sub
        + b"\x02" + bytes([1, 1, 1, 2, 2, 2])     # Up
        + b"\x03" + bytes([4, 4, 4, 6, 6, 6])     # Average
        + b"\x04" + bytes([1, 2, 3, 4, 5, 6])     # Paeth
    )
    img = decode_png(_png(2, 4, 2, scan))
    expected = np.array(
        [
            [[10, 20, 30], [15, 25, 35]],
            [[11, 21, 31], [17, 27, 37]],
            [[9, 14, 19], [19, 26, 34]],
            [[10, 16, 22], [23, 31, 40]],
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(img, expected)


def _naive_unfilter(filters, raw_rows, stride, bpp):
    """Per-byte reference implementation straight from the spec."""
    out = np.zeros((len(raw_rows), stride), dtype=np.int64)
    for y, (f, cur) in enumerate(zip(filters, raw_rows)):
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = out[y, i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = cur[i]
            elif f == 1:
                v = cur[i] + a
            elif f == 2:
                v = cur[i] + b
            elif f == 3:
                v = cur[i] + (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = cur[i] + pred
            out[y, i] = v & 0xFF
    return out.astype(np.uint8)


def test_png_differential_random_filters():
    rng = np.random.default_rng(7)
    for trial in range(5):
        w, h = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        stride = w * 3
        filters = rng.integers(0, 5, h)
        raw = rng.integers(0, 256, (h, stride), dtype=np.uint8)
        scan = b"".join(bytes([f]) + r.tobytes() for f, r in zip(filters, raw))
        got = decode_png(_png(w, h, 2, scan))
        want = _naive_unfilter(filters, raw, stride, 3).reshape(h, w, 3)
        np.testing.assert_array_equal(got, want)


def test_png_color_types():
    # grayscale replicates to RGB
    g = decode_png(_png(2, 1, 0, b"\x00" + bytes([7, 200])))
    np.testing.assert_array_equal(g, [[[7, 7, 7], [200, 200, 200]]])
    # palette indexes into PLTE
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    p = decode_png(_png(3, 1, 3, b"\x00" + bytes([2, 0, 1]), plte=plte))
    np.testing.assert_array_equal(p, [[[0, 0, 255], [255, 0, 0], [0, 255, 0]]])
    # RGBA drops alpha
    a = decode_png(_png(1, 1, 6, b"\x00" + bytes([9, 8, 7, 128])))
    np.testing.assert_array_equal(a, [[[9, 8, 7]]])
    # gray+alpha replicates gray, drops alpha
    ga = decode_png(_png(1, 1, 4, b"\x00" + bytes([42, 3])))
    np.testing.assert_array_equal(ga, [[[42, 42, 42]]])


def test_png_roundtrip_and_errors():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    with pytest.raises(MediaFormatError, match="signature"):
        decode_png(b"JFIF not a png")
    # spec-invalid depth/type combo refused (16-bit palette), not garbled
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    bad = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(MediaFormatError, match="invalid PNG bit depth"):
        decode_png(bad)
    # wrong-size scanline payload refused
    with pytest.raises(MediaFormatError, match="scanline size"):
        decode_png(_png(4, 2, 2, b"\x00" + b"ab"))


def test_png_16bit_roundtrip():
    rng = np.random.default_rng(5)
    img16 = rng.integers(0, 1 << 16, (7, 11, 3), dtype=np.uint16)
    # decode reduces 16-bit samples to the high byte
    np.testing.assert_array_equal(
        decode_png(encode_png(img16)), (img16 >> 8).astype(np.uint8))


def test_png_adam7_roundtrip():
    rng = np.random.default_rng(6)
    # dims deliberately not multiples of 8 so every pass shape is exercised
    img = rng.integers(0, 256, (13, 11, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img, interlace=True)), img)
    # tiny images where late passes are empty
    for h, w in [(1, 1), (2, 3), (5, 1), (1, 9)]:
        im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(im, interlace=True)), im)
    # 16-bit + Adam7 together
    img16 = rng.integers(0, 1 << 16, (9, 10, 3), dtype=np.uint16)
    np.testing.assert_array_equal(
        decode_png(encode_png(img16, interlace=True)),
        (img16 >> 8).astype(np.uint8))
    # truncated pass data refused: interlaced IHDR, payload cut to 8 bytes
    ihdr = struct.pack(">IIBBBBB", 11, 13, 8, 2, 0, 0, 1)
    bad = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 8))
           + _chunk(b"IEND", b""))
    with pytest.raises(MediaFormatError, match="Adam7|truncated|trailing"):
        decode_png(bad)


def test_png_subbyte_gray():
    from sparkft.media_codec import encode_png_gray

    rng = np.random.default_rng(7)
    for depth, scale in [(1, 255), (2, 85), (4, 17)]:
        raw = rng.integers(0, 1 << depth, (6, 13), dtype=np.uint8)
        dec = decode_png(encode_png_gray(raw, depth))
        want = (raw * scale).astype(np.uint8)
        np.testing.assert_array_equal(dec, np.repeat(want[:, :, None], 3, axis=2))
        # interlaced sub-byte: per-pass bit packing must not leak across rows
        dec_i = decode_png(encode_png_gray(raw, depth, interlace=True))
        np.testing.assert_array_equal(dec_i, np.repeat(want[:, :, None], 3, axis=2))


def test_wav_golden_and_roundtrip():
    samples = np.array([0, 16384, -16384, 32767], dtype=np.int16)
    body = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(body)) + body)
    arr, rate = decode_wav(wav)
    assert rate == 8000 and arr.shape == (4, 1)
    np.testing.assert_allclose(
        arr[:, 0], [0.0, 0.5, -0.5, 32767 / 32768], atol=1e-6)

    rng = np.random.default_rng(3)
    wave = rng.uniform(-0.9, 0.9, 500).astype(np.float32)
    back, rate2 = decode_wav(encode_wav(wave, 22050))
    assert rate2 == 22050 and back.shape == (500, 1)
    np.testing.assert_allclose(back[:, 0], wave, atol=1.0 / 16000)

    # stereo interleave preserved
    stereo = np.stack([wave, -wave], axis=1)
    back2, _ = decode_wav(encode_wav(stereo, 22050))
    np.testing.assert_allclose(back2, stereo, atol=1.0 / 16000)

    with pytest.raises(MediaFormatError, match="RIFF"):
        decode_wav(b"\x00" * 32)
    with pytest.raises(MediaFormatError, match="format code"):
        bad_fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)  # mu-law
        decode_wav(b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                   + b"fmt " + struct.pack("<I", 16) + bad_fmt
                   + b"data" + struct.pack("<I", 0))


def test_stdlib_codec_validates_metadata():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    data = encode_png(img)
    codec = StdlibCodec()
    np.testing.assert_array_equal(codec.decode(data, 4, 6), img)
    with pytest.raises(MediaFormatError, match="metadata says"):
        codec.decode(data, 8, 8)
    with pytest.raises(MediaFormatError, match="no SOS marker"):
        codec.decode(b"\xff\xd8\xff\xe0\x00\x04 j", 4, 6)  # JPEG, truncated
    with pytest.raises(MediaFormatError, match="unsupported image container"):
        codec.decode(b"GIF89a not supported", 4, 6)


def _test_image(h=41, w=67):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (127 + 120 * np.sin(xx / 9.0)).astype(np.uint8),
        (127 + 120 * np.cos(yy / 7.0)).astype(np.uint8),
        ((xx + yy) % 256).astype(np.uint8)], axis=2)


def test_jpeg_roundtrip_color():
    """Round-trip through our own baseline encoder: exact-shape output,
    bounded reconstruction error that shrinks as quality rises, 4:2:0
    strictly lossier than 4:4:4 (chroma decimation)."""
    from sparkft.media_jpeg import decode_jpeg, encode_jpeg

    img = _test_image()
    maes = {}
    for sub in ("444", "420"):
        for q in (95, 85, 50):
            out = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            assert out.shape == img.shape and out.dtype == np.uint8
            maes[(sub, q)] = np.abs(out.astype(int) - img.astype(int)).mean()
    assert maes[("444", 95)] < maes[("444", 50)] < 5.0
    assert maes[("420", 95)] < maes[("420", 50)] < 6.0
    assert maes[("444", 85)] < maes[("420", 85)]


def test_jpeg_restart_intervals_match_plain():
    """RSTn markers change the byte stream but not the decoded pixels
    (the DC predictor reset is exact on both sides)."""
    from sparkft.media_jpeg import decode_jpeg, encode_jpeg

    img = _test_image(24, 40)
    plain = encode_jpeg(img, quality=85, subsampling="420")
    rst = encode_jpeg(img, quality=85, subsampling="420", restart_interval=2)
    assert plain != rst and b"\xff\xd0" in rst
    np.testing.assert_array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_jpeg_grayscale_and_errors():
    from sparkft.media_jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:19, 0:33]
    g = (127 + 100 * np.sin(xx / 5.0) * np.cos(yy / 6.0)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (19, 33, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).mean() < 2.0

    with pytest.raises(MediaFormatError, match="bad SOI"):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 -> SOF2 (progressive): honest refusal, not garbage
    data = bytearray(encode_jpeg(_test_image(16, 16)))
    data[data.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(MediaFormatError, match="progressive|arithmetic"):
        decode_jpeg(bytes(data))


def test_stdlib_codec_decodes_jpeg_with_metadata_check():
    from sparkft.media_jpeg import encode_jpeg

    img = _test_image(16, 24)
    data = encode_jpeg(img, quality=95)
    codec = StdlibCodec()
    out = codec.decode(data, 24, 16)
    assert out.shape == (16, 24, 3)
    with pytest.raises(MediaFormatError, match="metadata says"):
        codec.decode(data, 8, 8)
