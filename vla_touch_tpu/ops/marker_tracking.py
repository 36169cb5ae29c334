"""On-device GelSight marker tracking.

Fixed-shape XLA re-design of the classical-CV force estimator
(``/root/reference/VLA/residual_controller/tactile/marker/marker_tracker.py``):
the reference pipeline is grayscale → Gaussian blur → adaptive threshold →
morphological open → contour centroids → KD-tree matching vs a calibration
baseline → mean displacement → force magnitude+direction (:81-114, :308-373).

Contours/KD-trees don't exist in XLA; the jittable redesign replaces them
with a **grid-local weighted centroid**: GelSight markers form a near-regular
grid (7×9 = 63, :211-231), so the image is tiled into marker-pitch cells and
each cell's thresholded mass centroid is computed in parallel.  Matching
becomes trivial — cell i at time t corresponds to cell i of the calibration
frame (markers displace less than one cell pitch) — and the displacement
field, mean displacement, and force come out of one fused kernel.  This is
what lets tactile preprocessing run on-device in the conditioning pipeline
instead of on the host CPU.

Force convention matches the reference (:342-373): magnitude = ‖mean
displacement‖₂, direction = unit vector; the stored 3-vector is
[dx, dy, magnitude] (the capture pipeline's ``gelsight_force/forces``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# cv2.getGaussianKernel(k, 0) uses fixed binomial tables for k <= 7.
_CV2_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
                 0.03125]),
}


def _gaussian_kernel1d(ksize: int, sigma: float | None) -> np.ndarray:
    if sigma is None and ksize in _CV2_SMALL_GAUSSIAN:
        return _CV2_SMALL_GAUSSIAN[ksize].astype(np.float32)
    if sigma is None:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = (ksize - 1) / 2
    x = np.arange(ksize) - r
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _sep_filter(img, k1d):
    """Separable 2-D filter on (H, W) float32, SAME padding."""
    k = jnp.asarray(k1d)
    img4 = img[None, :, :, None]
    kh = k.reshape(-1, 1, 1, 1)
    kw = k.reshape(1, -1, 1, 1)
    out = jax.lax.conv_general_dilated(
        img4, kh, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, :, :, 0]


def gaussian_blur(img, ksize: int = 5, sigma: float | None = None):
    """cv2.GaussianBlur semantics: sigma=None/0 uses cv2's default kernels
    (binomial tables for k<=7, else 0.3*((k-1)*0.5-1)+0.8)."""
    return _sep_filter(img, _gaussian_kernel1d(ksize, sigma))


def adaptive_threshold_inv(img, block: int = 11, c: float = 2.0):
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C, THRESH_BINARY_INV):
    mask = img < gaussian_local_mean(img) - c."""
    local_mean = _sep_filter(img, _gaussian_kernel1d(block, None))
    return (img < local_mean - c).astype(jnp.float32)


def _pool(mask, op, k: int = 3):
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    return jax.lax.reduce_window(
        mask, init, op, (k, k), (1, 1), "SAME")


def morph_open(mask, k: int = 3):
    """Erosion then dilation with a k×k ones kernel."""
    eroded = _pool(mask, jax.lax.min, k)
    return _pool(eroded, jax.lax.max, k)


def equalize_hist(img):
    """cv2.equalizeHist on a uint8-valued (H, W) image (float in [0, 255]
    accepted; values are rounded to bins).

    LUT semantics match cv2: ``lut[i] = round((cdf[i] - cdf_min) /
    (total - cdf_min) * 255)`` with cdf over the 256-bin histogram and
    cdf_min the first nonzero cdf value."""
    xi = jnp.clip(jnp.round(img.astype(jnp.float32)), 0, 255).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[xi.reshape(-1)].add(1)
    cdf = jnp.cumsum(hist)
    # first nonzero cdf value (cv2 skips empty leading bins)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, jnp.iinfo(jnp.int32).max))
    total = xi.size
    denom = jnp.maximum(total - cdf_min, 1)
    lut = jnp.round((cdf - cdf_min).astype(jnp.float32) / denom * 255.0)
    lut = jnp.clip(lut, 0, 255)
    return lut[xi]


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    grid_rows: int = 7                 # expected marker grid (7x9 = 63)
    grid_cols: int = 9
    min_cell_mass: float = 4.0         # px of marker mass for a valid cell
    blur_ksize: int = 5
    thresh_block: int = 11
    thresh_c: float = 2.0
    # GelSight sensor variant (reference marker_tracker.py:9,76-77):
    # 'standard' = adaptive threshold; 'hsr' = the HSR-lighting init path
    # (invert -> equalizeHist -> blur -> fixed threshold, :116-152).
    gelsight_version: str = "standard"
    hsr_threshold: float = 50.0
    # Dead-marker filter (reference detect_markers(filter_coords=...),
    # :154,186-201): cells whose centroid falls within filter_threshold px
    # of any (x, y) coordinate here are marked invalid.  (The reference
    # computes one summed distance across all coords — a degenerate form
    # when len > 1; this implementation uses the per-coordinate distance,
    # which is what the single-coord usage [18, 109] reduces to.)
    filter_coords: tuple = ()
    filter_threshold: float = 5.0


def marker_mask(frame, cfg: TrackerConfig):
    """RGB/gray frame (H, W[, 3]) -> binary marker mask (H, W)."""
    x = frame.astype(jnp.float32)
    if x.ndim == 3:
        # cv2 BGR2GRAY weights; inputs are RGB here so order flipped —
        # luminance weighting is symmetric enough for blob masks.
        x = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    if cfg.gelsight_version == "hsr":
        # HSR-lighting sensors image markers dark-on-light: invert, flatten
        # the illumination with histogram equalization, then a FIXED
        # threshold (markers bright after inversion) instead of the
        # adaptive one (reference init_HSR, marker_tracker.py:116-152).
        x = equalize_hist(255.0 - x)
        x = gaussian_blur(x, cfg.blur_ksize)
        m = (x > cfg.hsr_threshold).astype(jnp.float32)
        return morph_open(m)
    x = gaussian_blur(x, cfg.blur_ksize)
    m = adaptive_threshold_inv(x, cfg.thresh_block, cfg.thresh_c)
    return morph_open(m)


def grid_centroids(mask, cfg: TrackerConfig):
    """Per-cell weighted centroids.

    Returns (R*C, 2) centroids in (x, y) pixel coords, (R*C,) masses, and
    (R*C,) validity.  Cells are an even tiling of the image; pixels at the
    image edge beyond R*cell_h / C*cell_w are dropped (negligible).
    """
    H, W = mask.shape
    R, C = cfg.grid_rows, cfg.grid_cols
    ch, cw = H // R, W // C
    m = mask[: R * ch, : C * cw].reshape(R, ch, C, cw)
    m = m.transpose(0, 2, 1, 3)                      # (R, C, ch, cw)

    ys = jnp.arange(ch, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(cw, dtype=jnp.float32)[None, None, None, :]
    mass = jnp.sum(m, axis=(2, 3))                    # (R, C)
    safe = jnp.maximum(mass, 1e-6)
    cy = jnp.sum(m * ys, axis=(2, 3)) / safe
    cx = jnp.sum(m * xs, axis=(2, 3)) / safe
    # Cell offsets -> absolute pixel coordinates.
    oy = (jnp.arange(R, dtype=jnp.float32) * ch)[:, None]
    ox = (jnp.arange(C, dtype=jnp.float32) * cw)[None, :]
    cents = jnp.stack([cx + ox, cy + oy], axis=-1).reshape(R * C, 2)
    mass = mass.reshape(R * C)
    valid = mass >= cfg.min_cell_mass
    if cfg.filter_coords:
        fc = jnp.asarray(cfg.filter_coords, jnp.float32).reshape(-1, 2)
        d = jnp.linalg.norm(cents[:, None, :] - fc[None, :, :], axis=-1)
        valid = jnp.logical_and(valid,
                                jnp.all(d >= cfg.filter_threshold, axis=1))
    return cents, mass, valid


@partial(jax.jit, static_argnames=("cfg",))
def calibrate(frame, cfg: TrackerConfig = TrackerConfig()):
    """Baseline marker state from the first (unloaded) frame
    (reference ``calibrate``)."""
    cents, mass, valid = grid_centroids(marker_mask(frame, cfg), cfg)
    return {"centroids": cents, "valid": valid}


@partial(jax.jit, static_argnames=("cfg",))
def estimate_force(frame, baseline: dict, cfg: TrackerConfig = TrackerConfig()):
    """Force from one frame vs the calibration baseline.

    Returns dict with ``displacement`` (N, 2) per-cell vectors, ``valid``
    (N,), ``mean_disp`` (2,), ``magnitude`` (), ``direction`` (2,), and the
    packed ``force`` 3-vector [dx, dy, magnitude].
    """
    cents, mass, valid = grid_centroids(marker_mask(frame, cfg), cfg)
    both = jnp.logical_and(valid, baseline["valid"])
    disp = jnp.where(both[:, None], cents - baseline["centroids"], 0.0)
    n = jnp.maximum(jnp.sum(both), 1)
    mean_disp = jnp.sum(disp, axis=0) / n
    mag = jnp.linalg.norm(mean_disp)
    direction = jnp.where(mag > 0, mean_disp / jnp.maximum(mag, 1e-12), 0.0)
    return {
        "displacement": disp,
        "valid": both,
        "mean_disp": mean_disp,
        "magnitude": mag,
        "direction": direction,
        "force": jnp.concatenate([mean_disp, mag[None]]),
    }


@partial(jax.jit, static_argnames=("cfg",))
def estimate_force_sequence(frames, baseline: dict,
                            cfg: TrackerConfig = TrackerConfig()):
    """Batched over a (T, H, W[, 3]) frame sequence — one fused program
    (reference processes sequences frame-by-frame on host, :376-520)."""
    def one(frame):
        out = estimate_force(frame, baseline, cfg)
        return out["force"], out["mean_disp"]

    forces, disps = jax.vmap(one)(frames)
    return {"forces": forces, "displacements": disps}
