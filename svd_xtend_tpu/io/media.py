"""Video/GIF export utilities.

Behavior contract (reference train_svd.py:251-280): mp4 via an OpenCV-style
writer (RGB frames), GIF via PIL with 500 ms/frame default; validation saves
GIFs named by step (train_svd.py:1150).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def _to_uint8(frames: Sequence) -> List[np.ndarray]:
    out = []
    for f in frames:
        arr = np.asarray(f)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        out.append(arr)
    return out


def export_to_video(frames: Sequence, path: str, fps: int = 7) -> str:
    """Write RGB frames to an mp4 (cv2 if present, else imageio)."""
    frames = _to_uint8(frames)
    try:
        import cv2
        h, w, _ = frames[0].shape
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
    except ImportError:  # pragma: no cover
        import imageio
        imageio.mimwrite(path, frames, fps=fps)
    return path


def export_to_gif(frames: Sequence, path: str, duration_ms: int = 500) -> str:
    from PIL import Image
    pil = [Image.fromarray(f) for f in _to_uint8(frames)]
    if path.endswith(".mp4"):
        path = path[:-4] + ".gif"
    pil[0].save(path, format="GIF", append_images=pil[1:], save_all=True,
                duration=duration_ms, loop=0)
    return path
