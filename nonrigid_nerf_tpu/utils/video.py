"""Video writing with graceful degradation.

The reference writes mp4s via imageio/ffmpeg and swallows failures with a
hint (reference: train.py:1736-1781). This image has no ffmpeg, so the
preferred backend is OpenCV's VideoWriter; imageio is tried first for
environments that have ffmpeg.
"""

from __future__ import annotations

import numpy as np


def write_video(path: str, frames_u8: np.ndarray, fps: int = 30) -> bool:
    """frames_u8: (F, H, W, 3) uint8. Returns True on success."""
    frames_u8 = np.asarray(frames_u8)
    if frames_u8.ndim == 3:  # grayscale -> rgb
        frames_u8 = np.stack([frames_u8] * 3, -1)
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(path, frames_u8, fps=fps, quality=8)
        return True
    except Exception:
        pass
    try:
        import cv2
        h, w = frames_u8.shape[1:3]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("VideoWriter failed to open")
        for frame in frames_u8:
            writer.write(frame[..., ::-1])  # RGB -> BGR
        writer.release()
        return True
    except Exception as e:
        print(f"video write failed for {path} (no ffmpeg/cv2 codec?): {e}",
              flush=True)
        return False
