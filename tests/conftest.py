"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding code paths are exercised on CPU with
``--xla_force_host_platform_device_count=8`` (the TPU-equivalent code is
identical under jax.sharding; see SURVEY.md §4 prescription).
Must run before jax is imported anywhere.
"""

import os

# Hard overwrite: the environment pre-sets JAX_PLATFORMS to a TPU plugin (and
# its site hook re-sets it at interpreter start); tests must run on the
# virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin bootstrap (sitecustomize) calls
# jax.config.update("jax_platforms", ...) at interpreter start, which takes
# precedence over the env var — override it back before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: this 1-core host is compile-bound (quick tier
# ~18 min cold); repeat runs of unchanged tests hit the cache instead.
# Scoped per host-CPU signature (utils/cache.py) so a stale cross-host cache
# can never hand this process a mismatched-ISA CPU executable.
from causalvae_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Every test not marked ``slow`` is part of the ``quick`` tier
    (``pytest -m quick`` measured 9.8 min warm-cache vs ~25-50 min full on this 1-core
    host; both compile-bound)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def synthetic_digits(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic 28x28 'digit-like' grayscale images in [0, 1].

    Random thick strokes + blobs; used wherever the reference used MNIST
    (no dataset download in this environment)."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, 28, 28), dtype=np.float32)
    yy, xx = np.mgrid[0:28, 0:28]
    for i in range(n):
        img = np.zeros((28, 28), dtype=np.float32)
        # random walk stroke
        r, c = rng.integers(6, 22, size=2)
        for _ in range(rng.integers(20, 60)):
            rr = np.clip(r, 1, 26)
            cc = np.clip(c, 1, 26)
            img[rr - 1 : rr + 2, cc - 1 : cc + 2] = 1.0
            dr, dc = rng.integers(-1, 2, size=2)
            r = int(np.clip(r + dr, 1, 26))
            c = int(np.clip(c + dc, 1, 26))
        # occasional blob / ring
        if rng.random() < 0.5:
            cy, cx = rng.integers(8, 20, size=2)
            rad = rng.integers(3, 7)
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            if rng.random() < 0.5:
                img[d2 <= rad**2] = 1.0
            else:
                img[(d2 <= rad**2) & (d2 >= (rad - 2) ** 2)] = 1.0
        # soften edges a bit so the raw image is non-binary
        soft = img.copy()
        soft[1:] = np.maximum(soft[1:], 0.35 * img[:-1])
        soft[:, 1:] = np.maximum(soft[:, 1:], 0.35 * img[:, :-1])
        imgs[i] = soft
    return imgs


@pytest.fixture(scope="session")
def digit_images():
    return synthetic_digits(24, seed=7)
