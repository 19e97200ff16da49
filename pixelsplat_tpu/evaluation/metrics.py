"""Image metrics: PSNR / SSIM / LPIPS in JAX.

Mirrors /root/reference/src/evaluation/metrics.py:
- PSNR: -10 log10(mse) on [0,1]-clipped images.
- SSIM: skimage structural_similarity(win_size=11, gaussian_weights=True
  (sigma 1.5, truncate 3.5), channel_axis=0, data_range=1.0,
  use_sample_covariance=True). The gaussian window radius equals the border
  crop, so interior values are boundary-mode independent; we convolve and
  crop, which reproduces skimage exactly.
- LPIPS: see lpips.py (VGG16 variant).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .lpips import compute_lpips  # re-export  # noqa: F401


def compute_psnr(ground_truth: jax.Array, predicted: jax.Array) -> jax.Array:
    """(b, c, h, w) images in [0,1] -> (b,) PSNR in dB."""
    gt = jnp.clip(ground_truth, 0.0, 1.0)
    hat = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((gt - hat) ** 2, axis=(1, 2, 3))
    return -10.0 * jnp.log10(mse)


@lru_cache(maxsize=4)
def _gaussian_kernel(sigma: float = 1.5, truncate: float = 3.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable 2D filter over the last two axes, 'same' padding."""
    k = kernel.shape[0]
    pad = k // 2
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    flat = x.reshape(-1, 1, h, w)
    kh = kernel.reshape(1, 1, k, 1)
    kw = kernel.reshape(1, 1, 1, k)
    out = jax.lax.conv_general_dilated(flat, kh, (1, 1), [(pad, pad), (0, 0)])
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (pad, pad)])
    return out.reshape(*lead, h, w)


def compute_ssim(
    ground_truth: jax.Array,
    predicted: jax.Array,
    data_range: float = 1.0,
    sigma: float = 1.5,
    truncate: float = 3.5,
) -> jax.Array:
    """(b, c, h, w) -> (b,) mean SSIM (skimage-compatible)."""
    kernel = jnp.asarray(_gaussian_kernel(sigma, truncate))
    win_size = kernel.shape[0]
    pad = (win_size - 1) // 2
    np_points = win_size * win_size
    cov_norm = np_points / (np_points - 1)  # sample covariance

    x = ground_truth
    y = predicted
    ux = _filter2d(x, kernel)
    uy = _filter2d(y, kernel)
    uxx = _filter2d(x * x, kernel)
    uyy = _filter2d(y * y, kernel)
    uxy = _filter2d(x * y, kernel)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    s = s[..., pad:-pad, pad:-pad]
    return s.mean(axis=(1, 2, 3))
