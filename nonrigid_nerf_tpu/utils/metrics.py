"""Quantitative image metrics for evaluation: PSNR, SSIM, optional LPIPS.

Protocol matches the reference evaluation
(reference: free_viewpoint_rendering.py:826-876): PSNR over the whole image,
SSIM with gaussian weights sigma=1.5 / data_range=1 / no sample covariance
(skimage's structural_similarity settings), LPIPS (AlexNet) when an lpips
implementation is importable (the reference likewise degrades to a constant
when its cloned PerceptualSimilarity repo is missing).

skimage is not available in this image, so SSIM is implemented here
directly (gaussian-filter formulation, identical math).
"""

from __future__ import annotations


from typing import Optional

import numpy as np


def psnr(groundtruth: np.ndarray, generated: np.ndarray) -> float:
    mse = np.mean((groundtruth - generated) ** 2)
    return float(-10.0 * np.log10(mse))


def _gaussian_kernel1d(sigma: float, truncate: float = 3.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _gaussian_filter2d(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian blur with replicate-edge padding (numpy 'edge' ==
    scipy.ndimage's 'nearest', the mode skimage's SSIM uses)."""
    k = _gaussian_kernel1d(sigma)
    r = (len(k) - 1) // 2
    padded = np.pad(img, ((r, r), (0, 0)), mode="edge")
    out = np.empty_like(img)
    # convolve along axis 0
    tmp = np.zeros_like(img)
    for i, w in enumerate(k):
        tmp += w * padded[i:i + img.shape[0], :]
    padded = np.pad(tmp, ((0, 0), (r, r)), mode="edge")
    for j, w in enumerate(k):
        out = out if j else np.zeros_like(img)
        out += w * padded[:, j:j + img.shape[1]]
    return out


def ssim(groundtruth: np.ndarray, generated: np.ndarray,
         data_range: float = 1.0, sigma: float = 1.5,
         full: bool = False):
    """Gaussian-weighted SSIM, averaged over channels
    (= skimage structural_similarity(..., gaussian_weights=True, sigma=1.5,
    use_sample_covariance=False, multichannel=True))."""
    if groundtruth.ndim == 2:
        groundtruth = groundtruth[..., None]
        generated = generated[..., None]
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2

    vals, maps = [], []
    for c in range(groundtruth.shape[-1]):
        x = groundtruth[..., c].astype(np.float64)
        y = generated[..., c].astype(np.float64)
        mu_x = _gaussian_filter2d(x, sigma)
        mu_y = _gaussian_filter2d(y, sigma)
        mu_xx = _gaussian_filter2d(x * x, sigma)
        mu_yy = _gaussian_filter2d(y * y, sigma)
        mu_xy = _gaussian_filter2d(x * y, sigma)
        var_x = mu_xx - mu_x ** 2
        var_y = mu_yy - mu_y ** 2
        cov = mu_xy - mu_x * mu_y
        s = ((2 * mu_x * mu_y + C1) * (2 * cov + C2)) / (
            (mu_x ** 2 + mu_y ** 2 + C1) * (var_x + var_y + C2))
        # skimage crops the filter radius border from the mean; on images
        # smaller than the 11x11 window (skimage refuses those outright)
        # shrink the crop so the mean stays defined instead of going NaN
        r = int(3.5 * sigma + 0.5)
        r = min(r, (s.shape[0] - 1) // 2, (s.shape[1] - 1) // 2)
        vals.append(s[r:s.shape[0] - r, r:s.shape[1] - r].mean())
        maps.append(s)
    mean_val = float(np.mean(vals))
    if full:
        return mean_val, np.stack(maps, -1)
    return mean_val


_lpips_model = None


def lpips_distance(groundtruth: np.ndarray,
                   generated: np.ndarray) -> Optional[float]:
    """LPIPS (AlexNet), or None when no implementation is available.

    Prefers the native JAX pipeline (utils/lpips_jax.py, needs the
    `data/lpips_alex.npz` weight file — see tools/convert_lpips_weights.py),
    falls back to the torch `lpips` package if importable. Mirrors the
    reference's optional PerceptualSimilarity dependency
    (reference: free_viewpoint_rendering.py:790-797,846-855)."""
    from nonrigid_nerf_tpu.utils.lpips_jax import lpips_alex
    native = lpips_alex(groundtruth, generated)
    if native is not None:
        return native

    global _lpips_model
    try:
        import lpips
        import torch
    except ImportError:
        return None
    if _lpips_model is None:
        _lpips_model = lpips.LPIPS(net="alex")

    def to_torch(img):
        import torch
        t = 2.0 * torch.from_numpy(img.astype(np.float32)) - 1.0
        return t.permute(2, 0, 1).unsqueeze(0)

    with __import__("torch").no_grad():
        d = _lpips_model.forward(to_torch(groundtruth), to_torch(generated))
    return float(np.asarray(d.detach()).reshape(-1)[0])
