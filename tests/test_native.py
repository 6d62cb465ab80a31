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
