"""Parity tests: on-device (JAX) morphology vs host (numpy/scipy/cv2) oracle.

The host path mirrors the reference recipe exactly (ref mnist_test/01
dataset.py:11-99, mnist_test/03 dataset.py:11-96); the device path must agree
measure-by-measure."""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax.numpy as jnp

from causalvae_tpu.ops import morphology as dev
from causalvae_tpu.ops import morphology_host as host

from conftest import synthetic_digits


@pytest.fixture(scope="module")
def images():
    return synthetic_digits(24, seed=3)


def masks_of(images):
    return [host.largest_component(im > 0.2) for im in images]


def test_largest_component_parity(images):
    for im in images:
        got = np.asarray(dev.largest_component(jnp.asarray(im) > 0.2))
        want = host.largest_component(im > 0.2)
        assert np.array_equal(got, want)


def test_edt_max_parity(images):
    for im in images:
        got = float(dev.edt_max(jnp.asarray(im) > 0.2))
        want = host.edt_max(im > 0.2)
        assert abs(got - want) < 1e-4


def test_edt_against_scipy(images):
    # host oracle itself defers to scipy; double-check the device path directly
    for im in images[:8]:
        got = float(dev.edt_max(jnp.asarray(im) > 0.2))
        want = float(ndi.distance_transform_edt(im > 0.2).max())
        assert abs(got - want) < 1e-4


def test_perimeter_parity(images):
    for mask in masks_of(images):
        got = float(dev.perimeter(jnp.asarray(mask)))
        want = host.perimeter(mask)
        assert abs(got - want) < 1e-4


def test_euler_parity(images):
    for mask in masks_of(images):
        got = int(dev.euler_number(jnp.asarray(mask)))
        want = host.euler_number(mask)
        assert got == want


def test_euler_known_shapes():
    solid = np.zeros((28, 28), bool)
    solid[5:20, 5:20] = True
    assert host.euler_number(solid) == 1
    ring = solid.copy()
    ring[9:16, 9:16] = False
    assert host.euler_number(ring) == 0
    two_holes = ring.copy()
    two_holes[10:12, 10:12] = False  # still one hole... make separate holes
    two_holes = solid.copy()
    two_holes[8:10, 8:10] = False
    two_holes[14:16, 14:16] = False
    assert host.euler_number(two_holes) == -1
    assert int(dev.euler_number(jnp.asarray(ring))) == 0
    assert int(dev.euler_number(jnp.asarray(two_holes))) == -1


def test_ellipse_parity(images):
    for mask in masks_of(images):
        gm, ge, go = dev.ellipse_params(jnp.asarray(mask))
        wm, we, wo = host.ellipse_params(mask)
        assert float(gm) == pytest.approx(wm, rel=2e-3, abs=2e-3)
        assert float(ge) == pytest.approx(we, rel=2e-3, abs=2e-3)
        if we > 0.1:  # orientation of a near-disk is undefined (float noise
            # arbitrarily picks +-pi/4); only compare when the ellipse is real
            assert float(go) == pytest.approx(wo, rel=2e-3, abs=2e-3)


def test_convex_area_parity(images):
    for mask in masks_of(images):
        got = float(dev.convex_area(jnp.asarray(mask)))
        want = host.convex_area(mask)
        assert got == pytest.approx(want, abs=1.0), (got, want)


@pytest.mark.slow
def test_skeleton_parity(images):
    for im in images:
        got = np.asarray(dev.skeletonize(jnp.asarray(im) > 0.2))
        want = host.skeletonize_zs(im > 0.2)
        assert np.array_equal(got, want)


def test_skeleton_endpoints_junctions_parity(images):
    for im in images:
        skel = host.skeletonize_zs(im > 0.2)
        ge, gj = dev.skeleton_endpoints_junctions(jnp.asarray(skel))
        we, wj = host.skeleton_endpoints_junctions(skel)
        assert int(ge) == we and int(gj) == wj


def test_hu_parity(images):
    for im in images:
        got = np.asarray(dev.hu_moments_log(jnp.asarray(im)))
        want = host.hu_moments_log(im)
        # invariants below the shared 1e-6 numerical floor are clamped to 0
        # in both paths; those just above it (|value| near 0.6) still carry
        # f32 cancellation error of up to a few 1e-2 in log10 scale
        sel = np.abs(want) <= 0.6
        np.testing.assert_allclose(got[sel], want[sel], atol=4e-2)


def test_features12_parity(images):
    got = np.asarray(dev.features12_batch(jnp.asarray(images)))
    want = host.extract_features_batch(images, 12)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_features16_parity(images):
    got = np.asarray(dev.features16_batch(jnp.asarray(images)))
    want = host.extract_features_batch(images, 16)
    # Hu entries (9:) whose raw invariant is < 1e-6 are f32 noise — skip them
    noise = np.zeros_like(want, dtype=bool)
    noise[:, 9:] = np.abs(want[:, 9:]) > 0.6
    got = np.where(noise, want, got)
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_empty_image_returns_zeros():
    z = np.zeros((28, 28), np.float32)
    assert np.array_equal(host.extract_features_12(z), np.zeros(12, np.float32))
    assert np.array_equal(host.extract_features_16(z), np.zeros(16, np.float32))
    assert np.allclose(np.asarray(dev.features12(jnp.asarray(z))), 0.0)
    assert np.allclose(np.asarray(dev.features16(jnp.asarray(z))), 0.0)


def test_feature_ranges(images):
    f = host.extract_features_batch(images, 12)
    # normalized features should be O(1)
    assert np.all(f[:, 0] > 0) and np.all(f[:, 0] < 1)  # area/784
    assert np.all(f[:, 6] > 0) and np.all(f[:, 6] <= 1 + 1e-6)  # solidity
    assert np.all((f[:, 10] >= 0) & (f[:, 10] <= 1))  # symmetry
