"""Training losses: the standard 3DGS photometric objective.

The reference is forward-only (training delegated to a sister project,
/root/reference/README.md:100), so this module follows the de-facto 3DGS
training recipe instead: ``loss = (1 - lambda) * L1 + lambda * (1 - SSIM)``
with lambda = 0.2 and an 11x11 sigma-1.5 Gaussian SSIM window (Kerbl et al.
2023, "3D Gaussian Splatting for Real-Time Radiance Field Rendering", §5 —
public method description, no code consulted).

TPU notes: the SSIM window is separable, so the five filtered maps come from
TEN rank-1 convolutions expressed as ``lax.conv_general_dilated`` over an
NCHW image — XLA lowers these onto the MXU.  Everything is jittable, static
shape, and batch-friendly (leading dims broadcast).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SSIM_C1 = 0.01**2  # (k1 * L)^2 with L = 1.0 dynamic range
SSIM_C2 = 0.03**2


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float):
    import numpy as np

    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    w = np.exp(-(x**2) / (2.0 * sigma**2))
    w /= w.sum()
    # return a NUMPY array: any jnp.asarray/cast executed under a jit trace
    # yields a DynamicJaxprTracer, which the lru_cache would capture and
    # poison every later jit in the process (UnexpectedTracerError on the
    # second training run).  numpy constants embed safely in any trace.
    return w.astype(np.float32)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable 'same' Gaussian blur of [..., H, W, C] along H and W."""
    size = window.shape[0]
    *lead, h, w, c = img.shape
    x = img.reshape((-1, h, w, c)).transpose(0, 3, 1, 2)  # NCHW
    x = x.reshape((-1, 1, h, w))  # depthwise via batch fold
    kh = window.reshape(1, 1, size, 1)
    kw = window.reshape(1, 1, 1, size)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad = (size - 1) // 2
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn
    )
    x = x.reshape((-1, c, h, w)).transpose(0, 2, 3, 1)
    return x.reshape((*lead, h, w, c))


def ssim(
    img: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over [..., H, W, C] images in [0, 1] (scalar)."""
    w = _gaussian_window(window_size, sigma)
    mu_x = _blur(img, w)
    mu_y = _blur(target, w)
    mu_x2 = mu_x * mu_x
    mu_y2 = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x2 = _blur(img * img, w) - mu_x2
    sigma_y2 = _blur(target * target, w) - mu_y2
    sigma_xy = _blur(img * target, w) - mu_xy
    num = (2.0 * mu_xy + SSIM_C1) * (2.0 * sigma_xy + SSIM_C2)
    den = (mu_x2 + mu_y2 + SSIM_C1) * (sigma_x2 + sigma_y2 + SSIM_C2)
    return jnp.mean(num / den)


def l1(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(img - target))


def gaussian_splatting_loss(
    img: jnp.ndarray,
    target: jnp.ndarray,
    ssim_weight: float = 0.2,
    rgb_only: bool = True,
) -> jnp.ndarray:
    """(1 - w) L1 + w (1 - SSIM), the standard 3DGS photometric objective.

    ``rgb_only`` drops the alpha channel of RGBA renders (the usual setup:
    supervision is on color; alpha is driven indirectly)."""
    if rgb_only and img.shape[-1] == 4:
        img = img[..., :3]
        target = target[..., :3]
    return (1.0 - ssim_weight) * l1(img, target) + ssim_weight * (
        1.0 - ssim(img, target)
    )
