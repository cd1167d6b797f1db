"""Host-side video read/write.

The reference writes mp4 via imageio/ffmpeg and reads via decord /
torchvision.io (reference: base/pipelines/sample.py:91,
interpolation/sample.py:73-81, vsr/sample.py:85). Those stay host-side here
too; gated so the framework works without ffmpeg (falls back to .npy)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def write_video(path: str, frames: np.ndarray, fps: int = 8, quality: int = 9) -> str:
    """frames: (F, H, W, 3) uint8. Writes mp4 when imageio+ffmpeg is present,
    otherwise falls back to an .npy next to the requested path."""
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, list(frames), fps=fps, quality=quality)
        return path
    except Exception:
        pass
    try:  # no ffmpeg: the framework's native MJPEG/AVI codec (csrc/mjpeg_avi.c)
        from lavie_tpu.native import mjpeg_available, write_avi

        if mjpeg_available():
            alt = os.path.splitext(path)[0] + ".avi"
            write_avi(alt, frames, fps=fps, quality=min(100, quality * 10 + 5))
            return alt
    except Exception:
        pass
    try:  # animated GIF via PIL
        from PIL import Image

        alt = os.path.splitext(path)[0] + ".gif"
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            alt, save_all=True, append_images=imgs[1:],
            duration=max(1, int(1000 / fps)), loop=0,
        )
        return alt
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, frames)
        return alt


def save_video_grid(
    path: str, videos: "list[np.ndarray]", fps: int = 8, cols: Optional[int] = None
) -> str:
    """Tile multiple (F, H, W, 3) uint8 videos into one grid video
    (reference: interpolation/utils.py:253-271)."""
    import math

    n = len(videos)
    assert n > 0
    f, h, w, c = videos[0].shape
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    grid = np.zeros((f, rows * h, cols * w, c), dtype=np.uint8)
    for i, v in enumerate(videos):
        r, cc = divmod(i, cols)
        grid[:, r * h:(r + 1) * h, cc * w:(cc + 1) * w] = v[:f]
    return write_video(path, grid, fps=fps)


def read_video(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    """Returns (F, H, W, 3) uint8. Reads mp4 via imageio, or .npy fallback."""
    if path.endswith(".npy"):
        frames = np.load(path)
    elif path.endswith(".avi"):
        from lavie_tpu.native import read_avi

        frames = read_avi(path)
    else:
        import imageio.v2 as imageio

        reader = imageio.get_reader(path)
        frames = []
        for i, frame in enumerate(reader):
            if max_frames is not None and i >= max_frames:
                break
            frames.append(frame)
        reader.close()
        frames = np.stack(frames)
    if max_frames is not None:
        frames = frames[:max_frames]
    return frames.astype(np.uint8)
