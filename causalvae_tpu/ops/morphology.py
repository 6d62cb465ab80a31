"""On-device (JAX/XLA) morphological feature measurement.

TPU-native re-design of the reference's host-side skimage/scipy/cv2 feature
extraction (ref: mnist_test/01_baseline_causal_vae/dataset.py:11-99 and
mnist_test/03_measurement_approach/dataset.py:11-96). Every measure is a
fixed-shape, jit/vmap-compatible computation:

  * connected components  -> iterative max-label propagation (lax.while_loop)
  * Euclidean distance    -> exact brute-force min over background pixels
    transform max            (a (HW, HW) masked reduction; HW=784 for MNIST)
  * perimeter             -> 4-neighbour border + weighted 3x3 scoring
  * ellipse fit           -> closed-form central moments / inertia tensor
  * solidity              -> exact convex-hull membership via a static set of
                             integer half-plane directions (doubled integer
                             coordinates make the test exact in float32)
  * Euler number          -> bit-quad counting (8-connectivity)
  * skeleton              -> Zhang-Suen thinning (lax.while_loop), endpoint /
                             junction scoring with REFLECT_101 borders
  * Hu moments            -> closed-form normalized central moments

The host oracle in ``morphology_host`` implements identical numerics; tests
assert element-wise parity. Batch use: ``features12_batch`` / ``features16_batch``
(vmapped + jitted) — this replaces the reference's per-image host loop (the
hot path of the Phase-2 measurement workloads, ref mnist_test/03
analyze_counterfactual.py:93-102) with one fused on-device computation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32


def _shift(x: jnp.ndarray, dr: int, dc: int, fill=0):
    """Shift a 2D array by (dr, dc), filling vacated cells with `fill`."""
    h, w = x.shape
    out = jnp.full_like(x, fill)
    rs_src = slice(max(0, -dr), h - max(0, dr))
    cs_src = slice(max(0, -dc), w - max(0, dc))
    rs_dst = slice(max(0, dr), h - max(0, -dr))
    cs_dst = slice(max(0, dc), w - max(0, -dc))
    return out.at[rs_dst, cs_dst].set(x[rs_src, cs_src])


_NEIGH8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
_NEIGH4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]


def largest_component(binary: jnp.ndarray) -> jnp.ndarray:
    """Mask of the largest 8-connected component (skimage label + argmax-area
    semantics, ref dataset.py:32-38). Returns all-False for an empty image."""
    h, w = binary.shape
    big = h * w  # background sentinel
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + jax.lax.broadcasted_iota(
        jnp.int32, (h, w), 1
    )
    labels0 = jnp.where(binary, idx, big)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        labels, _ = state
        neigh = labels
        for dr, dc in _NEIGH8:
            neigh = jnp.minimum(neigh, _shift(labels, dr, dc, fill=big))
        new = jnp.where(binary, neigh, big)
        return (new, jnp.any(new != labels))

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.array(True)))
    # Each component is keyed by its minimum row-major pixel index; argmax over
    # per-key areas then matches scipy/skimage's label-discovery order on area
    # ties (first-discovered wins, like np.argmax over regionprops areas).
    counts = jnp.zeros(h * w + 1, jnp.int32).at[labels.ravel()].add(1)
    counts = counts.at[big].set(0)
    best = jnp.argmax(counts)
    return (labels == best) & binary


def edt_max(binary: jnp.ndarray) -> jnp.ndarray:
    """Max Euclidean distance to background (thickness, ref dataset.py:47-48).

    Exact brute force: for every pixel the min squared distance to any
    background pixel; fine at 28x28 (784^2 pairs) and fully parallel."""
    h, w = binary.shape
    rr = jax.lax.broadcasted_iota(_F32, (h, w), 0).ravel()
    cc = jax.lax.broadcasted_iota(_F32, (h, w), 1).ravel()
    d2 = (rr[:, None] - rr[None, :]) ** 2 + (cc[:, None] - cc[None, :]) ** 2
    bg = ~binary.ravel()
    inf = jnp.asarray(np.float32(np.inf))
    d2min = jnp.min(jnp.where(bg[None, :], d2, inf), axis=1)
    d2min = jnp.where(binary.ravel(), d2min, 0.0)
    any_bg = jnp.any(bg)
    # scipy's distance_transform_edt with NO background pixels degenerates to
    # d[i, j] = hypot(i + 1, j) (a virtual zero above the top-left corner);
    # max = hypot(h, w - 1). Replicated so device == host on saturated images
    # (e.g. an early-training VAE reconstructing uniform gray).
    no_bg_max = jnp.asarray(math.hypot(h, w - 1), _F32)
    return jnp.where(any_bg, jnp.sqrt(jnp.max(d2min)), no_bg_max)


_PERIM_OFFSETS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
_PERIM_KVALS = [10, 2, 10, 2, 1, 2, 10, 2, 10]
_PERIM_WEIGHTS = np.zeros(50, dtype=np.float32)
_PERIM_WEIGHTS[[5, 7, 15, 17, 25, 27]] = 1.0
_PERIM_WEIGHTS[[21, 33]] = math.sqrt(2.0)
_PERIM_WEIGHTS[[13, 23]] = (1.0 + math.sqrt(2.0)) / 2.0


def perimeter(mask: jnp.ndarray) -> jnp.ndarray:
    """skimage perimeter(neighborhood=4): weighted border-pixel scoring."""
    m = mask.astype(jnp.int32)
    eroded = m
    for dr, dc in _NEIGH4:
        eroded = eroded * _shift(m, dr, dc)
    border = m - eroded
    score = jnp.zeros_like(border)
    for (dr, dc), k in zip(_PERIM_OFFSETS, _PERIM_KVALS):
        # correlation: score[p] += k * border[p - offset]
        score = score + k * _shift(border, dr, dc)
    score = score * border  # only border-centred scores carry weight (odd idx)
    return jnp.sum(jnp.take(jnp.asarray(_PERIM_WEIGHTS), score))


def euler_number(mask: jnp.ndarray) -> jnp.ndarray:
    """Euler characteristic with 8-connected foreground via bit-quads."""
    m = jnp.pad(mask.astype(jnp.int32), 1)
    a = m[:-1, :-1]
    b = m[:-1, 1:]
    c = m[1:, :-1]
    d = m[1:, 1:]
    s = a + b + c + d
    c1 = jnp.sum(s == 1)
    c3 = jnp.sum(s == 3)
    cd = jnp.sum((s == 2) & (a == d))
    return (c1 - c3 - 2 * cd) // 4


def central_moments(img: jnp.ndarray, order: int = 3):
    """Central moments mu[p, q] (p over rows) about the intensity centroid."""
    img = img.astype(_F32)
    h, w = img.shape
    r = jax.lax.broadcasted_iota(_F32, (h, 1), 0)[:, 0]
    c = jax.lax.broadcasted_iota(_F32, (w, 1), 0)[:, 0]
    m00 = jnp.sum(img)
    m10 = jnp.sum(img * r[:, None])
    m01 = jnp.sum(img * c[None, :])
    safe = jnp.where(m00 == 0, 1.0, m00)
    rc = m10 / safe
    cc = m01 / safe
    rp = jnp.stack([(r - rc) ** p for p in range(order + 1)])  # (o+1, h)
    cq = jnp.stack([(c - cc) ** q for q in range(order + 1)])  # (o+1, w)
    return jnp.einsum("ph,qw,hw->pq", rp, cq, img), m00


def ellipse_params(mask: jnp.ndarray):
    """(major_axis_length, eccentricity, orientation) — regionprops semantics.

    Second-order central moments of a binary mask are computed with exact
    int32 arithmetic (mu_pq * m00^2 = m_pq*m00 - m_p0*m_0q is an integer well
    inside int32 range at 28x28), sidestepping float32 cancellation."""
    m = mask.astype(jnp.int32)
    h, w = mask.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m00 = jnp.sum(m)
    m10 = jnp.sum(m * r)
    m01 = jnp.sum(m * c_)
    m20 = jnp.sum(m * r * r)
    m02 = jnp.sum(m * c_ * c_)
    m11 = jnp.sum(m * r * c_)
    # exact integers: mu_pq * m00
    n20 = m20 * m00 - m10 * m10
    n02 = m02 * m00 - m01 * m01
    n11 = m11 * m00 - m10 * m01
    safe2 = jnp.where(m00 == 0, 1.0, (m00 * m00).astype(_F32))
    a = n02.astype(_F32) / safe2  # mu02 / mu00
    b = -n11.astype(_F32) / safe2
    # normalize -0.0 -> +0.0: arctan2(-0.0, negative) is -pi but the host's
    # integer-zero path yields +0.0 -> +pi; mirror-symmetric wide masks would
    # otherwise flip orientation by pi (f6 = 1.0 vs 0.0)
    b = jnp.where(b == 0.0, 0.0, b)
    c = n20.astype(_F32) / safe2
    tr2 = (a + c) / 2.0
    det = a * c - b * b
    sq = jnp.sqrt(jnp.maximum(tr2 * tr2 - det, 0.0))
    l1 = tr2 + sq
    l2 = jnp.maximum(tr2 - sq, 0.0)
    major = 4.0 * jnp.sqrt(jnp.maximum(l1, 0.0))
    ecc = jnp.where(l1 > 0, jnp.sqrt(1.0 - l2 / jnp.where(l1 > 0, l1, 1.0)), 0.0)
    orient = jnp.where(
        a - c == 0.0,
        jnp.where(b < 0, -math.pi / 4.0, math.pi / 4.0),
        0.5 * jnp.arctan2(-2.0 * b, c - a),
    )
    orient = jnp.where(m00 == 0, 0.0, orient)  # empty mask: host returns 0.0
    return major, ecc, orient


@functools.lru_cache(maxsize=None)
def _hull_directions(max_comp: int) -> np.ndarray:
    """All coprime integer directions (a, b), |a|, |b| <= max_comp.

    In doubled coordinates every candidate hull-edge normal is such a pair, so
    half-plane tests over this set compute exact convex-hull membership."""
    dirs = []
    for a in range(-max_comp, max_comp + 1):
        for b in range(-max_comp, max_comp + 1):
            if (a, b) == (0, 0):
                continue
            if math.gcd(abs(a), abs(b)) == 1:
                dirs.append((a, b))
    return np.array(dirs, dtype=np.float32)  # (D, 2)


def convex_area(mask: jnp.ndarray) -> jnp.ndarray:
    """Pixel count of the convex hull image (offset_coordinates semantics).

    Hull of pixel centers offset +-0.5 along each axis. Works in doubled
    integer coordinates so everything is exact int32 arithmetic:

      maxdot[d] = max over hull support points of <p, d>, computed from
                  per-row foreground column extremes (the max of a linear
                  functional over a row's pixels sits at an extreme column),
                  plus max(|a|, |b|) for the four +-1 offset points;
      the hull's intersection with each pixel row is a column interval
      obtained by folding every half-plane into a floor/ceil bound, so no
      (HW x D) intermediate is ever materialized.

    The direction set contains every coprime integer pair large enough to
    include all possible hull-edge normals, making the test exact."""
    h, w = mask.shape
    dirs_np = _hull_directions(2 * max(h, w) + 2)
    dirs = jnp.asarray(dirs_np, dtype=jnp.int32)  # (D, 2)
    a, b = dirs[:, 0], dirs[:, 1]  # (D,)
    neg = jnp.int32(-(2**30))

    rows_any = jnp.any(mask, axis=1)  # (h,)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    cmin = jnp.min(jnp.where(mask, cidx, w), axis=1)  # (h,)
    cmax = jnp.max(jnp.where(mask, cidx, -1), axis=1)  # (h,)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]  # (h,)

    # per-row maximum of <(2r, 2c), (a, b)> over foreground pixels
    c_ext = jnp.where(b[:, None] > 0, cmax[None, :], cmin[None, :])  # (D, h)
    row_dot = 2 * a[:, None] * ridx[None, :] + 2 * b[:, None] * c_ext  # (D, h)
    row_dot = jnp.where(rows_any[None, :], row_dot, neg)
    maxdot = jnp.max(row_dot, axis=1) + jnp.maximum(jnp.abs(a), jnp.abs(b))  # (D,)

    # fold half-planes into per-row column bounds: 2*b*c <= maxdot - 2*a*r
    K = maxdot[:, None] - 2 * a[:, None] * ridx[None, :]  # (D, h)
    big = jnp.int32(2**30)
    # b > 0: c <= floor(K / 2b)
    hi_d = jnp.where(b[:, None] > 0, K // jnp.maximum(2 * b, 1)[:, None], big)
    hi = jnp.min(hi_d, axis=0)  # (h,)
    # b < 0: c >= ceil(K / 2b) = -(K // (-2b))
    lo_d = jnp.where(b[:, None] < 0, -(K // jnp.maximum(-2 * b, 1)[:, None]), -big)
    lo = jnp.max(lo_d, axis=0)  # (h,)
    # b == 0 (a = +-1): row feasible iff 2*a*r <= maxdot
    row_ok = jnp.all(jnp.where(b[:, None] == 0, K >= 0, True), axis=0)  # (h,)

    lo = jnp.maximum(lo, 0)
    hi = jnp.minimum(hi, w - 1)
    count = jnp.where(row_ok & (hi >= lo), hi - lo + 1, 0)
    return jnp.sum(count).astype(_F32)


def _zhang_suen_pass(img: jnp.ndarray, step: int) -> jnp.ndarray:
    """One Zhang-Suen sub-iteration (step 0 or 1). img is int32 0/1."""
    # neighbours P2..P9 clockwise from north; _shift(img, dr, dc) reads
    # img[r - dr, c - dc], so the neighbour at (r-1, c) is _shift(img, 1, 0)...
    # use explicit source offsets instead:
    def nb(dr, dc):  # value of neighbour at (r+dr, c+dc)
        return _shift(img, -dr, -dc)

    n = [nb(-1, 0), nb(-1, 1), nb(0, 1), nb(1, 1), nb(1, 0), nb(1, -1), nb(0, -1), nb(-1, -1)]
    bsum = sum(n)
    ring = n + [n[0]]
    a = sum(((ring[k] == 0) & (ring[k + 1] == 1)).astype(jnp.int32) for k in range(8))
    if step == 0:
        cond3 = (n[0] * n[2] * n[4]) == 0
        cond4 = (n[2] * n[4] * n[6]) == 0
    else:
        cond3 = (n[0] * n[2] * n[6]) == 0
        cond4 = (n[0] * n[4] * n[6]) == 0
    remove = (img == 1) & (bsum >= 2) & (bsum <= 6) & (a == 1) & cond3 & cond4
    return jnp.where(remove, 0, img)


def skeletonize(binary: jnp.ndarray, max_iter: int = 100) -> jnp.ndarray:
    """Zhang-Suen thinning — bit-exact with morphology_host.skeletonize_zs."""
    img0 = binary.astype(jnp.int32)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        img, _, it = state
        a = _zhang_suen_pass(img, 0)
        b = _zhang_suen_pass(a, 1)
        return (b, jnp.any(b != img), it + 1)

    out, _, _ = jax.lax.while_loop(cond, body, (img0, jnp.array(True), 0))
    return out.astype(bool)


def skeleton_endpoints_junctions(skel: jnp.ndarray):
    """Endpoint/junction counts; REFLECT_101 border like cv2.filter2D."""
    s = jnp.pad(skel.astype(jnp.int32), 1, mode="reflect")
    h, w = skel.shape
    score = jnp.zeros((h, w), jnp.int32)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            k = 10 if (dr, dc) == (0, 0) else 1
            score = score + k * s[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
    endpoints = jnp.sum(score == 11)
    junctions = jnp.sum(score >= 13)
    return endpoints, junctions


def hu_moments_log(img: jnp.ndarray) -> jnp.ndarray:
    """Seven log-scaled Hu moments; cv2 convention (x over columns).

    val = -sign(h) * log10(|h| + 1e-10) / 10 (ref mnist_test/03
    dataset.py:77-91)."""
    mu, m00 = central_moments(img, 3)
    safe = jnp.where(m00 == 0, 1.0, m00)

    def eta(px, qy):  # cv2 nu_pq: p over x (columns) -> mu[row_exp=qy, col_exp=px]
        return mu[qy, px] / safe ** (1.0 + (px + qy) / 2.0)

    n20, n02, n11 = eta(2, 0), eta(0, 2), eta(1, 1)
    n30, n03, n21, n12 = eta(3, 0), eta(0, 3), eta(2, 1), eta(1, 2)
    h1 = n20 + n02
    h2 = (n20 - n02) ** 2 + 4 * n11**2
    h3 = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    h4 = (n30 + n12) ** 2 + (n21 + n03) ** 2
    h5 = (n30 - 3 * n12) * (n30 + n12) * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2) + (
        3 * n21 - n03
    ) * (n21 + n03) * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2)
    h6 = (n20 - n02) * ((n30 + n12) ** 2 - (n21 + n03) ** 2) + 4 * n11 * (n30 + n12) * (
        n21 + n03
    )
    h7 = (3 * n21 - n03) * (n30 + n12) * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2) - (
        n30 - 3 * n12
    ) * (n21 + n03) * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2)
    hu = jnp.stack([h1, h2, h3, h4, h5, h6, h7])
    # numerical floor: invariants below 1e-6 are float-cancellation noise at
    # f32 (their sign is a coin flip that the log transform would blow up to
    # +/-1.0); both this and the host oracle clamp them to exactly 0
    hu = jnp.where(jnp.abs(hu) < 1e-6, 0.0, hu)
    return -jnp.sign(hu) * jnp.log10(jnp.abs(hu) + 1e-10) / 10.0


def _bbox(mask: jnp.ndarray):
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0]
    minr = jnp.min(jnp.where(rows, ridx, h))
    maxr = jnp.max(jnp.where(rows, ridx + 1, 0))
    minc = jnp.min(jnp.where(cols, cidx, w))
    maxc = jnp.max(jnp.where(cols, cidx + 1, 0))
    return minr, minc, maxr, maxc


def features12(img: jnp.ndarray, threshold: float = 0.2) -> jnp.ndarray:
    """On-device 12-feature morphology vector (ref mnist_test/01
    dataset.py:11-99 recipe; see morphology_host.extract_features_12)."""
    img = img.reshape(img.shape[-2], img.shape[-1]).astype(_F32)
    binary = img > threshold
    mask = largest_component(binary)

    area = jnp.sum(mask.astype(_F32))
    f1 = area / 784.0
    f2 = perimeter(mask) / 100.0
    f3 = edt_max(binary) / 5.0
    major, ecc, orient = ellipse_params(mask)
    f4 = major / 28.0
    f5 = ecc
    f6 = (orient + math.pi / 2.0) / math.pi
    ca = convex_area(mask)
    f7 = jnp.where(ca > 0, area / jnp.where(ca > 0, ca, 1.0), 0.0)
    minr, minc, maxr, maxc = _bbox(mask)
    height = (maxr - minr).astype(_F32)
    width = (maxc - minc).astype(_F32)
    bbox_area = height * width
    f8 = jnp.where(bbox_area > 0, area / jnp.where(bbox_area > 0, bbox_area, 1.0), 0.0)
    f9 = jnp.where(height > 0, width / jnp.where(height > 0, height, 1.0), 0.0) / 3.0
    f10 = (euler_number(mask).astype(_F32) + 2.0) / 4.0
    f11 = 1.0 - jnp.mean(jnp.abs(img - img[:, ::-1]))
    f12 = 1.0 - jnp.mean(jnp.abs(img - img[::-1, :]))
    feats = jnp.stack([f1, f2, f3, f4, f5, f6, f7, f8, f9, f10, f11, f12])
    return jnp.where(jnp.any(binary), feats, jnp.zeros(12, _F32))


def features16(img: jnp.ndarray, threshold: float = 0.2) -> jnp.ndarray:
    """On-device 16-feature morphology vector (ref mnist_test/03
    dataset.py:11-96 recipe; see morphology_host.extract_features_16)."""
    img = img.reshape(img.shape[-2], img.shape[-1]).astype(_F32)
    binary = img > threshold
    mask = largest_component(binary)

    area = jnp.sum(mask.astype(_F32))
    f1 = area / 784.0
    f2 = edt_max(binary) / 5.0
    ca = convex_area(mask)
    f3 = jnp.where(ca > 0, area / jnp.where(ca > 0, ca, 1.0), 0.0)
    minr, minc, maxr, maxc = _bbox(mask)
    height = (maxr - minr).astype(_F32)
    width = (maxc - minc).astype(_F32)
    ratio = jnp.where(height > 0, width / jnp.where(height > 0, height, 1.0), 0.0)
    f4 = jnp.clip(ratio, 0.0, 3.0) / 3.0
    f5 = (euler_number(mask).astype(_F32) + 2.0) / 4.0
    f6 = 1.0 - jnp.mean(jnp.abs(img - img[:, ::-1]))
    f7 = 1.0 - jnp.mean(jnp.abs(img - img[::-1, :]))
    skel = skeletonize(binary)
    endpoints, junctions = skeleton_endpoints_junctions(skel)
    f8 = endpoints.astype(_F32) / 5.0
    f9 = junctions.astype(_F32) / 5.0
    hu = hu_moments_log(img)
    feats = jnp.concatenate([jnp.stack([f1, f2, f3, f4, f5, f6, f7, f8, f9]), hu])
    return jnp.where(jnp.any(binary), feats, jnp.zeros(16, _F32))


@functools.partial(jax.jit, static_argnums=1)
def features12_batch(imgs: jnp.ndarray, threshold: float = 0.2) -> jnp.ndarray:
    return jax.vmap(lambda im: features12(im, threshold))(imgs)


@functools.partial(jax.jit, static_argnums=1)
def features16_batch(imgs: jnp.ndarray, threshold: float = 0.2) -> jnp.ndarray:
    return jax.vmap(lambda im: features16(im, threshold))(imgs)
