"""Pixel kernels: the numpy halves of the augmentation operators.

Plain-numpy implementations of the reference's pixel transforms
(``generate_images_from_dicom.py``): exact integer translate with
zero-fill (O14, ``:116-127``), horizontal flip (O15, ``:137``),
cut-paste of a box region (O16, ``:155-165``), zoom of a region or the
whole frame with center pad-or-crop (O17/O18, ``:191,211-243``).

Divergence ledger (documented, intended-semantics):
- The reference's ``ndimage.shift``/``ndimage.zoom`` are spline
  interpolators; this engine's DEFAULT translates exactly (slicing) and
  zooms by nearest-neighbor index mapping. Geometry is identical;
  interpolated gray values at non-integer grid points are not. For
  pixel parity, ``zoom_bilinear``/``shift_bilinear`` implement the
  order-1 spline (bilinear — ``ndimage``'s ``order=1``, endpoint-
  aligned coordinates, zero fill) in pure numpy, selectable via the
  ``interp="bilinear"`` parameter on ``scale_image``/
  ``zoom_box_region``; outputs then match ``ndimage`` within integer
  rounding. The reference's default ``order=3`` cubic spline remains
  out of scope (scipy is not a dependency of this engine; when scipy
  IS present, callers wanting cubic parity should route pixels through
  it directly).
- All randomness is seeded per (image_id, variant) via
  ``seeded_rng`` — the reference's unseeded ``random.*``
  (``:117-118,148-153``) is nondeterministic and untestable.

These functions run inside Arrow-batched pandas UDFs / mapInPandas
(``multimodal.py``); they never touch Spark APIs themselves, so they are
unit-testable without a session.
"""

from __future__ import annotations

import hashlib

import numpy as np


def seeded_rng(image_id: str, variant: int, op: str) -> np.random.Generator:
    """Deterministic per-(id, variant, op) generator: the engine's RNG
    convention (SURVEY.md §7 ground rules)."""
    key = f"{image_id}|{op}|{variant}".encode()
    seed = int.from_bytes(hashlib.sha256(key).digest()[:8], "big")
    return np.random.default_rng(seed)


def shift_image(arr: np.ndarray, rx: int, ry: int) -> np.ndarray:
    """Exact translate by (rx, ry) with zero fill. rx shifts columns
    (x-axis), ry shifts rows (y-axis) — the reference's convention."""
    out = np.zeros_like(arr)
    h, w = arr.shape[:2]
    src_y = slice(max(0, -ry), min(h, h - ry))
    src_x = slice(max(0, -rx), min(w, w - rx))
    dst_y = slice(max(0, ry), min(h, h + ry))
    dst_x = slice(max(0, rx), min(w, w + rx))
    out[dst_y, dst_x] = arr[src_y, src_x]
    return out


def flip_image(arr: np.ndarray) -> np.ndarray:
    return np.fliplr(arr)


def zoom_nearest(arr: np.ndarray, rf: float) -> np.ndarray:
    """Nearest-neighbor zoom to (round(h*rf), round(w*rf))."""
    h, w = arr.shape[:2]
    nh, nw = max(1, round(h * rf)), max(1, round(w * rf))
    yi = np.minimum((np.arange(nh) / rf).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(nw) / rf).astype(np.int64), w - 1)
    return arr[np.ix_(yi, xi)]


def _to_dtype(out: np.ndarray, dtype: np.dtype) -> np.ndarray:
    """float interpolation result → caller dtype: round-half-even and
    clip for integer pixel types, plain cast otherwise."""
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(dtype)
    return out.astype(dtype)


def zoom_bilinear(arr: np.ndarray, rf: float) -> np.ndarray:
    """Bilinear zoom to (round(h*rf), round(w*rf)): the order-1 spline of
    the reference's ``ndimage.zoom`` (generate_images_from_dicom.py:191,
    211), endpoint-aligned coordinates (``grid_mode=False``) — output
    sample i reads input coordinate ``i*(in-1)/(out-1)``. Pure numpy;
    matches ``scipy.ndimage.zoom(order=1)`` within integer rounding."""
    h, w = arr.shape[:2]
    nh, nw = max(1, round(h * rf)), max(1, round(w * rf))
    ys = np.linspace(0.0, h - 1.0, nh)
    xs = np.linspace(0.0, w - 1.0, nw)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = arr.astype(np.float64)
    top = a[np.ix_(y0, x0)] * (1.0 - fx) + a[np.ix_(y0, x1)] * fx
    bot = a[np.ix_(y1, x0)] * (1.0 - fx) + a[np.ix_(y1, x1)] * fx
    return _to_dtype(top * (1.0 - fy) + bot * fy, arr.dtype)


def shift_bilinear(arr: np.ndarray, rx: float, ry: float) -> np.ndarray:
    """Bilinear (order-1 spline) translate by float (rx, ry) with zero
    fill — ``ndimage.shift(order=1, cval=0)`` semantics (reference
    ``:116-127`` shifts through the spline interpolator). Integer shifts
    reproduce ``shift_image`` exactly."""
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    ys = np.arange(h, dtype=np.float64)[:, None] - ry
    xs = np.arange(w, dtype=np.float64)[None, :] - rx
    y0 = np.floor(ys)
    x0 = np.floor(xs)
    fy = ys - y0
    fx = xs - x0
    out = np.zeros((h, w), dtype=np.float64)
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            yi = y0.astype(np.int64) + dy
            xi = x0.astype(np.int64) + dx
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            vals = np.where(
                valid,
                a[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)],
                0.0,
            )
            out += wy * wx * vals
    return _to_dtype(out, arr.dtype)


_ZOOMS = {"nearest": zoom_nearest, "bilinear": zoom_bilinear}


def scale_image(arr: np.ndarray, rf: float, interp: str = "nearest") -> np.ndarray:
    """Whole-image zoom, then center pad (shrink) or center crop (grow)
    back to the original dims — reference ``:219-243``. ``interp``
    selects the zoom kernel: ``nearest`` (engine default, exact index
    mapping) or ``bilinear`` (ndimage order-1 pixel parity)."""
    h, w = arr.shape[:2]
    z = _ZOOMS[interp](arr, rf)
    zh, zw = z.shape[:2]
    out = np.zeros_like(arr)
    if zh <= h:
        oy, ox = (h - zh) // 2, (w - zw) // 2
        out[oy : oy + zh, ox : ox + zw] = z
    else:
        cy, cx = (zh - h) // 2, (zw - w) // 2
        out[:, :] = z[cy : cy + h, cx : cx + w]
    return out


def cut_paste_box(arr: np.ndarray, box: tuple[int, int, int, int],
                  rx: int, ry: int) -> np.ndarray:
    """O16 pixel half: cut the box region (zeroing the source) and paste
    it at the shifted location, clipped to the frame."""
    x, y, w, h = box
    H, W = arr.shape[:2]
    region = arr[y : y + h, x : x + w].copy()
    out = arr.copy()
    out[y : y + h, x : x + w] = 0
    nx, ny = x + rx, y + ry
    px0, py0 = max(0, nx), max(0, ny)
    px1, py1 = min(W, nx + w), min(H, ny + h)
    if px1 > px0 and py1 > py0:
        out[py0:py1, px0:px1] = region[
            py0 - ny : py1 - ny, px0 - nx : px1 - nx
        ]
    return out


def zoom_box_region(arr: np.ndarray, box: tuple[int, int, int, int],
                    rf: float, interp: str = "nearest") -> np.ndarray:
    """O17 pixel half: zoom the box's cutout and re-center it about the
    box center, clamped to the frame (reference ``:191-204``). ``interp``
    as in ``scale_image``."""
    x, y, w, h = box
    H, W = arr.shape[:2]
    z = _ZOOMS[interp](arr[y : y + h, x : x + w], rf)
    nh, nw = z.shape[:2]
    nx = max(0, int(x + w / 2 - nw / 2))
    ny = max(0, int(y + h / 2 - nh / 2))
    out = arr.copy()
    px1, py1 = min(W, nx + nw), min(H, ny + nh)
    out[ny:py1, nx:px1] = z[: py1 - ny, : px1 - nx]
    return out


def brighten(arr: np.ndarray, delta: int) -> np.ndarray:
    """Saturating brightness shift — an augmentation op in its own
    right, and the canonical perceptual-hash invariance probe: dHash
    compares adjacent pixels, so any order-preserving transform that
    saturates nothing leaves the hash bit-identical."""
    if np.issubdtype(arr.dtype, np.integer):
        info = np.iinfo(arr.dtype)
        return np.clip(
            arr.astype(np.int64) + delta, info.min, info.max
        ).astype(arr.dtype)
    return arr + delta
