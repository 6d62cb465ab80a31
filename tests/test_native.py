"""Native IO runtime tests: builds the C++ loader, checks decode parity
against numpy and the threaded batch loader end-to-end."""

import os
import struct

import numpy as np
import pytest

from causalvae_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}"
)


def _write_tiff_f32(path, arr):
    """Minimal little-endian uncompressed float32 TIFF writer (one strip)."""
    h, w = arr.shape
    data = arr.astype("<f4").tobytes()
    # header: II, 42, IFD offset 8
    n_entries = 8
    ifd_size = 2 + n_entries * 12 + 4
    data_off = 8 + ifd_size

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    ifd = struct.pack("<H", n_entries)
    ifd += entry(256, 3, 1, w)            # width
    ifd += entry(257, 3, 1, h)            # height
    ifd += entry(258, 3, 1, 32)           # bits per sample
    ifd += entry(259, 3, 1, 1)            # compression: none
    ifd += entry(273, 4, 1, data_off)     # strip offset
    ifd += entry(278, 3, 1, h)            # rows per strip
    ifd += entry(279, 4, 1, len(data))    # strip byte count
    ifd += entry(339, 3, 1, 3)            # sample format: float
    ifd += struct.pack("<I", 0)           # next IFD
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8) + ifd + data)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 LZW encoder (spec section 13): MSB-first bit packing,
    ClearCode 256 / EOI 257, early code-width change. Test-side encoder for
    the native decoder's golden fixtures."""
    out_codes = []
    table = {}
    state = {"next": 258, "bits": 9}

    def reset():
        table.clear()
        for i in range(256):
            table[bytes([i])] = i
        state["next"], state["bits"] = 258, 9

    def put(code):
        out_codes.append((code, state["bits"]))

    reset()
    put(256)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        put(table[w])
        table[w + c] = state["next"]
        state["next"] += 1
        # TIFF early change: the DECODER's table runs one entry behind the
        # encoder's, so the encoder bumps width when its next free code hits
        # 2^bits (the decoder, at 2^bits - 1). Verified against libtiff:
        # cv2-written LZW tiffs decode with the C++ side, and PIL decodes
        # this encoder's output (test_lzw_encoder_matches_libtiff_decoder).
        if state["next"] == (1 << state["bits"]) and state["bits"] < 12:
            state["bits"] += 1
        if state["next"] == 4094:
            put(256)
            reset()
        w = c
    if w:
        put(table[w])
    put(257)
    acc = nacc = 0
    out = bytearray()
    for code, nb in out_codes:
        acc = (acc << nb) | code
        nacc += nb
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Naive PackBits: replicate runs >=3, literal chunks otherwise."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([(257 - run) & 0xFF, data[i]])
            i += run
        else:
            j = i
            while (j < len(data) and j - i < 128
                   and not (j + 2 < len(data)
                            and data[j] == data[j + 1] == data[j + 2])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _write_tiff_ext(path, strips, w, h, *, bits, compression, predictor=1,
                    sample_format=1, rows_per_strip=None):
    """General little-endian grayscale TIFF writer with pre-encoded strips."""
    rows_per_strip = rows_per_strip or h
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
        (259, 3, 1, compression), (262, 3, 1, 1),  # BlackIsZero (for PIL)
        (277, 3, 1, 1), (278, 3, 1, rows_per_strip),
        (339, 3, 1, sample_format),
    ]
    if predictor != 1:
        entries.append((317, 3, 1, predictor))
    n_entries = len(entries) + 2  # + strip offsets/counts tags
    ifd_size = 2 + n_entries * 12 + 4
    # strip offset/count arrays go right after the IFD when count > 1
    arrays_off = 8 + ifd_size
    arrays = b""
    if len(strips) > 1:
        offsets_off = arrays_off
        counts_off = arrays_off + 4 * len(strips)
        data_off = counts_off + 4 * len(strips)
        offs, cur = [], data_off
        for s in strips:
            offs.append(cur)
            cur += len(s)
        arrays = struct.pack(f"<{len(strips)}I", *offs)
        arrays += struct.pack(f"<{len(strips)}I", *(len(s) for s in strips))
        entries.append((273, 4, len(strips), offsets_off))
        entries.append((279, 4, len(strips), counts_off))
    else:
        data_off = arrays_off
        entries.append((273, 4, 1, data_off))
        entries.append((279, 4, 1, len(strips[0])))
    entries.sort()
    ifd = struct.pack("<H", n_entries)
    for tag, typ, count, value in entries:
        ifd += struct.pack("<HHII", tag, typ, count, value)
    ifd += struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8) + ifd + arrays
                + b"".join(strips))


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(6):
        arr = rng.random((40, 56)).astype(np.float32) * (i + 1)
        if i % 2 == 0:
            p = str(root / f"img-{i}.npy")
            np.save(p, arr)
        else:
            p = str(root / f"img-{i}.vessel.mip.tiff")
            _write_tiff_f32(p, arr)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def _numpy_reference(arr, hw, binarize):
    """Python reference of the native transform (bilinear, half-pixel)."""
    import jax
    import jax.numpy as jnp

    out = jax.image.resize(jnp.asarray(arr), hw, method="bilinear")
    out = np.asarray(out)
    lo, hi = out.min(), out.max()
    out = (out - lo) / (hi - lo) if hi > lo else np.zeros_like(out)
    if binarize:
        out = (out > out.mean()).astype(np.float32)
    return out


def test_decode_image_parity(image_files):
    paths, arrays = image_files
    for p, arr in zip(paths, arrays):
        got = native.decode_image(p, (20, 28), binarize=False)
        assert got is not None, p
        want = _numpy_reference(arr, (20, 28), False)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_binarize(image_files):
    paths, _ = image_files
    got = native.decode_image(paths[0], (20, 28), binarize=True)
    assert set(np.unique(got)).issubset({0.0, 1.0})


def test_decode_flip(image_files):
    paths, _ = image_files
    base = native.decode_image(paths[0], (20, 28))
    h = native.decode_image(paths[0], (20, 28), flip_mode=1)
    v = native.decode_image(paths[0], (20, 28), flip_mode=2)
    np.testing.assert_allclose(base[:, ::-1], h, atol=1e-6)
    np.testing.assert_allclose(base[::-1, :], v, atol=1e-6)


def test_batch_loader_end_to_end(image_files):
    paths, arrays = image_files
    order = np.asarray([0, 1, 2, 3, 4, 5, 0, 1], np.int32)
    loader = native.NativeBatchLoader(
        paths, order, (20, 28), batch_size=4, binarize=True, n_threads=2
    )
    batches = list(loader)
    loader.close()
    assert len(batches) == 2
    seen = sorted(np.concatenate([b[1] for b in batches]).tolist())
    assert seen == sorted(order.tolist())
    for data, _ in batches:
        assert data.shape == (4, 20, 28, 1)
        assert set(np.unique(data)).issubset({0.0, 1.0})


def test_loader_missing_file_yields_zeros(image_files):
    paths, _ = image_files
    loader = native.NativeBatchLoader(
        [paths[0], "/nonexistent/file.tiff"], np.asarray([1, 1], np.int32),
        (8, 8), batch_size=2, binarize=False,
    )
    (data, idx), = list(loader)
    loader.close()
    np.testing.assert_array_equal(data, 0.0)


def test_batch_loader_in_submission_order(image_files):
    """Batches must arrive in submission order regardless of worker
    completion order, so positional consumers stay corpus-aligned."""
    paths, _ = image_files
    rng = np.random.default_rng(0)
    order = rng.integers(0, len(paths), 64).astype(np.int32)
    loader = native.NativeBatchLoader(
        paths, order, (16, 16), batch_size=4, binarize=True,
        n_threads=4, max_queue=3,
    )
    got = np.concatenate([idx for _, idx in loader])
    loader.close()
    np.testing.assert_array_equal(got, order)


# ---------------------------------------------------------------------------
# Compressed-TIFF ingestion (LZW tag 5, PackBits 32773, predictor 2)
# ---------------------------------------------------------------------------


def test_lzw_encoder_golden_bitstream():
    """Pin the TIFF-LZW bit conventions against hand-derived spec bytes:
    encode(b'\\x00\\x00\\x00') = Clear(256),0,258,257 at 9 bits MSB-first
    = 100000000 000000000 100000010 100000001 -> 80 00 20 50 10."""
    assert _lzw_encode(b"\x00\x00\x00") == bytes([0x80, 0x00, 0x20, 0x50, 0x10])


def test_decode_lzw_tiff_8bit_multistrip(tmp_path):
    rng = np.random.default_rng(3)
    # low-entropy content so LZW actually builds multi-char table entries
    arr = (rng.integers(0, 4, (40, 56)) * 80).astype(np.uint8)
    rows = 16  # 3 strips: 16 + 16 + 8 rows
    strips = [
        _lzw_encode(arr[y : y + rows].tobytes())
        for y in range(0, 40, rows)
    ]
    p = str(tmp_path / "lzw8.vessel.mip.tiff")
    _write_tiff_ext(p, strips, 56, 40, bits=8, compression=5,
                    rows_per_strip=rows)
    got = native.decode_image(p, (20, 28), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (20, 28), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_lzw_tiff_16bit_predictor2(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 65535, (24, 32)).astype(np.uint16)
    diff = arr.copy()
    diff[:, 1:] = arr[:, 1:] - arr[:, :-1]  # uint16 wraps mod 2^16
    strips = [_lzw_encode(diff.astype("<u2").tobytes())]
    p = str(tmp_path / "lzw16p2.vessel.mip.tiff")
    _write_tiff_ext(p, strips, 32, 24, bits=16, compression=5, predictor=2)
    got = native.decode_image(p, (24, 32), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (24, 32), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_packbits_tiff(tmp_path):
    rng = np.random.default_rng(5)
    arr = np.where(rng.random((30, 40)) > 0.7,
                   rng.integers(0, 255, (30, 40)), 0).astype(np.uint8)
    strips = [_packbits_encode(arr[y : y + 10].tobytes())
              for y in range(0, 30, 10)]
    p = str(tmp_path / "pb.vessel.mip.tiff")
    _write_tiff_ext(p, strips, 40, 30, bits=8, compression=32773,
                    rows_per_strip=10)
    got = native.decode_image(p, (30, 40), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (30, 40), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_lzw_long_image_exercises_width_growth(tmp_path):
    """Enough distinct sequences to push the code table past 511/1023
    (10- and 11-bit codes) including the early-change boundary."""
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (64, 96)).astype(np.uint8)  # high entropy
    strips = [_lzw_encode(arr.tobytes())]
    p = str(tmp_path / "lzwwide.tiff")
    _write_tiff_ext(p, strips, 96, 64, bits=8, compression=5)
    got = native.decode_image(p, (64, 96), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (64, 96), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_real_libtiff_lzw_predictor_file(tmp_path):
    """Ground truth: a file written by a REAL libtiff (via cv2), which uses
    LZW + horizontal-differencing predictor 2 — the exact combination
    tifffile writes for *.vessel.mip.tiff exports (ref 00_core/dataset.py:228)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    p = str(tmp_path / "libtiff_lzw.tiff")
    assert cv2.imwrite(p, arr, [cv2.IMWRITE_TIFF_COMPRESSION, 5])
    got = native.decode_image(p, (48, 64), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (48, 64), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_lzw_encoder_matches_libtiff_decoder(tmp_path):
    """The test-side encoder itself is validated against an independent
    LZW decoder (PIL's bundled libtiff), so encoder+decoder cannot share a
    complementary convention bug."""
    Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, (40, 80)).astype(np.uint8)  # crosses 9->10 bits
    p = str(tmp_path / "ours_lzw.tiff")
    _write_tiff_ext(p, [_lzw_encode(arr.tobytes())], 80, 40,
                    bits=8, compression=5)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, arr)

def test_decode_deflate_tiff_multistrip(tmp_path):
    """Adobe deflate (compression 8): zlib-compressed strips; encoded by the
    stdlib zlib so decoder conventions can't be self-confirming."""
    import zlib

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    rows = 16
    strips = [zlib.compress(arr[y : y + rows].tobytes())
              for y in range(0, 40, rows)]
    p = str(tmp_path / "zip8.vessel.mip.tiff")
    _write_tiff_ext(p, strips, 56, 40, bits=8, compression=8,
                    rows_per_strip=rows)
    got = native.decode_image(p, (40, 56), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (40, 56), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_deflate_tiff_16bit_predictor2_legacy_tag(tmp_path):
    """Legacy tag 32946 + predictor 2 on 16-bit data."""
    import zlib

    rng = np.random.default_rng(10)
    arr = rng.integers(0, 65535, (24, 32)).astype(np.uint16)
    diff = arr.copy()
    diff[:, 1:] = arr[:, 1:] - arr[:, :-1]
    strips = [zlib.compress(diff.astype("<u2").tobytes())]
    p = str(tmp_path / "zip16p2.tiff")
    _write_tiff_ext(p, strips, 32, 24, bits=16, compression=32946, predictor=2)
    got = native.decode_image(p, (24, 32), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (24, 32), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_real_libtiff_deflate_file(tmp_path):
    """Ground truth: a deflate TIFF written by a REAL libtiff (via cv2,
    COMPRESSION_ADOBE_DEFLATE=8)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    p = str(tmp_path / "libtiff_zip.tiff")
    assert cv2.imwrite(p, arr, [cv2.IMWRITE_TIFF_COMPRESSION, 8])
    got = native.decode_image(p, (48, 64), binarize=False)
    assert got is not None
    want = _numpy_reference(arr.astype(np.float32), (48, 64), False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
