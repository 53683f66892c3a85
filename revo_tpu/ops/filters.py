"""Separable filters: Gaussian blur, pyramid downsampling, Sobel.

TPU-native replacements for cv::GaussianBlur / cv::pyrDown / cv::Sobel used
by the reference pyramid builder (imgpyramidrgbd.cpp:82,101-108) and Canny.
All filters are expressed as small separable convolutions so XLA maps them
onto fused VPU ops; borders use REFLECT_101 (OpenCV's default
BORDER_REFLECT_101) via jnp.pad(mode="reflect").
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _sep_filter(img: jax.Array, kx: jax.Array, ky: jax.Array) -> jax.Array:
    """Separable 2-D correlation with REFLECT_101 borders on an (H, W) image."""
    rx = kx.shape[0] // 2
    ry = ky.shape[0] // 2
    x = jnp.pad(img, ((ry, ry), (rx, rx)), mode="reflect")
    # Rows (axis 1) with kx.
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        kx[None, None, None, :].astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
    )
    # Cols (axis 0) with ky.
    x = jax.lax.conv_general_dilated(
        x,
        ky[None, None, :, None].astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
    )
    return x[0, 0]


def gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """cv::getGaussianKernel: sampled Gaussian, normalized to sum 1."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize) - (ksize - 1) * 0.5
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(
    img: jax.Array, ksize: int = 7, sigma: float = 2.0, quantize: bool = True
) -> jax.Array:
    """cv::GaussianBlur(gray, 7x7, 2) as used before Canny
    (imgpyramidrgbd.cpp:101-108).  ``quantize`` rounds to integer levels to
    mirror uint8 semantics of the reference pipeline."""
    k = jnp.asarray(gaussian_kernel(ksize, sigma))
    out = _sep_filter(img.astype(jnp.float32), k, k)
    if quantize:
        out = jnp.round(out)
    return out


# cv::pyrDown kernel: outer([1,4,6,4,1]/16).
_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def pyr_down(img: jax.Array, quantize: bool = True) -> jax.Array:
    """cv::pyrDown: 5-tap Gaussian blur + 2x decimation (imgpyramidrgbd.cpp:82).

    Output size is (H+1)//2 x (W+1)//2, samples taken at even coordinates.
    ``quantize`` reproduces uint8 rounding of the reference gray pyramid.
    """
    k = jnp.asarray(_PYR_K)
    blurred = _sep_filter(img.astype(jnp.float32), k, k)
    out = blurred[::2, ::2]
    if quantize:
        out = jnp.round(out)
    return out


# Sobel aperture-3 kernels (x-derivative; y is the transpose). OpenCV's
# convention: Sx = [[-1,0,1],[-2,0,2],[-1,0,1]] as a correlation.
_SOBEL_D = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
_SOBEL_S = np.array([1.0, 2.0, 1.0], dtype=np.float32)


def sobel(img: jax.Array):
    """3x3 Sobel derivatives (gx, gy) with REFLECT_101 borders.

    Matches cv::Sobel(src, CV_16S, 1|0, 0|1, ksize=3) exactly for integer
    -valued inputs (the Canny front end, canny.cpp in OpenCV).
    """
    x = img.astype(jnp.float32)
    gx = _sep_filter(x, jnp.asarray(_SOBEL_D), jnp.asarray(_SOBEL_S))
    gy = _sep_filter(x, jnp.asarray(_SOBEL_S), jnp.asarray(_SOBEL_D))
    return gx, gy
