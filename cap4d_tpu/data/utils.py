"""Host-side image / crop / camera-ray utilities (numpy + cv2).

Reference parity: cap4d/datasets/utils.py. These run on CPU in the data
pipeline — they are intentionally NOT jax code (host IO is not TPU work).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

CROP_MARGIN = 0.2


def crop_image(img: np.ndarray, crop_box: np.ndarray, bg_value=0) -> np.ndarray:
    """Crop with out-of-bounds padding at bg_value (datasets/utils.py:26-50).

    Copies the box∩image overlap explicitly, so a box lying fully outside
    the image (extreme off-screen head projections) yields an all-background
    crop instead of a negative-slice broadcast error."""
    img_h, img_w = img.shape[:2]
    x0, y0, x1, y1 = (int(v) for v in crop_box[:4])
    out = np.ones((y1 - y0, x1 - x0, *img.shape[2:]), dtype=img.dtype) * bg_value
    ix0, ix1 = min(max(x0, 0), img_w), min(max(x1, 0), img_w)
    iy0, iy1 = min(max(y0, 0), img_h), min(max(y1, 0), img_h)
    if ix1 > ix0 and iy1 > iy0:
        out[iy0 - y0 : iy1 - y0, ix0 - x0 : ix1 - x0, ...] = img[iy0:iy1, ix0:ix1, ...]
    return out


def rescale_image(img: np.ndarray, target_resolution: int) -> np.ndarray:
    """cv2 resize; area for downscale, linear for upscale."""
    interp = cv2.INTER_AREA if target_resolution < img.shape[0] else cv2.INTER_LINEAR
    return cv2.resize(img, (target_resolution, target_resolution), interpolation=interp)


def apply_bg(img: np.ndarray, bg_weights: np.ndarray,
             bg_color: np.ndarray = np.array([255, 255, 255])) -> np.ndarray:
    w = bg_weights / 255.0
    return bg_color[None, None] * (1.0 - w) + img * w


def verts_to_pytorch3d(verts_2d: np.ndarray, crop_box: np.ndarray) -> np.ndarray:
    """Pixel coords → crop-relative pytorch3d NDC [-1,1], x/y negated."""
    out = verts_2d.copy()
    out[..., 0] = -((verts_2d[..., 0] - crop_box[..., 0]) / (crop_box[..., 2] - crop_box[..., 0]) * 2.0 - 1.0)
    out[..., 1] = -((verts_2d[..., 1] - crop_box[..., 1]) / (crop_box[..., 3] - crop_box[..., 1]) * 2.0 - 1.0)
    return out


def get_square_bbox(bbox: np.ndarray, border_margin: float = 0.1, mode: str = "max"):
    bbox = bbox.astype(int)
    bbox_h = bbox[3] - bbox[1]
    bbox_w = bbox[2] - bbox[0]
    center = ((bbox[2] + bbox[0]) // 2, (bbox[3] + bbox[1]) // 2)
    side = max(bbox_h, bbox_w) if mode == "max" else min(bbox_h, bbox_w)
    dim = int(side // 2.0 * (1.0 + border_margin))
    return (center[0] - dim, center[1] - dim, center[0] + dim, center[1] + dim)


def get_bbox_from_verts(verts_2d: np.ndarray, vert_mask: np.ndarray) -> np.ndarray:
    head = verts_2d[vert_mask]
    bbox = [head[..., 0].min(), head[..., 1].min(), head[..., 0].max(), head[..., 1].max()]
    return np.array(get_square_bbox(np.array(bbox), border_margin=CROP_MARGIN))


def load_camera_rays(crop_box, intr, extr, target_resolution: int) -> np.ndarray:
    """World-space unit ray directions of the crop-adjusted camera (3,H,W)."""
    scale = target_resolution / (crop_box[2] - crop_box[0])
    new_fx = intr[0, 0] * scale
    new_fy = intr[1, 1] * scale
    new_cx = (intr[0, 2] - crop_box[0]) * scale
    new_cy = (intr[1, 2] - crop_box[1]) * scale
    u, v = np.meshgrid(np.arange(target_resolution), np.arange(target_resolution))
    d = np.stack(((u - new_cx) / new_fx, (v - new_cy) / new_fy, np.ones_like(u)), axis=0)
    d = d / (np.linalg.norm(d, axis=0, keepdims=True) + 1e-8)
    h = d.shape[1]
    d = np.linalg.inv(extr[:3, :3]) @ d.reshape(3, -1)
    return d.reshape(3, h, -1)


def adjust_intrinsics_crop(fx, fy, cx, cy, bbox, target_resolution):
    scale = target_resolution / (bbox[2] - bbox[0])
    return fx * scale, fy * scale, (cx - bbox[0]) * scale, (cy - bbox[1]) * scale


def get_crop_mask(orig_resolution, target_resolution, crop_box) -> np.ndarray:
    m = np.ones(orig_resolution)
    m = crop_image(m, crop_box, bg_value=0)
    return rescale_image(m, target_resolution)


class FrameReader:
    """Directory-of-frames reader (sorted); mp4s are read via imageio/cv2."""

    def __init__(self, video_path: Path):
        self.frame_list = sorted(Path(video_path).glob("*.*"))

    def __len__(self):
        return len(self.frame_list)

    def __getitem__(self, index):
        return cv2.imread(str(self.frame_list[index]))[..., [2, 1, 0]]


class VideoFrameReader:
    """mp4 reader via cv2 (replaces the reference's decord dependency)."""

    def __init__(self, video_path):
        self.cap = cv2.VideoCapture(str(video_path))
        self.n = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __len__(self):
        return self.n

    def __getitem__(self, index):
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, index)
        ok, frame = self.cap.read()
        if not ok:
            raise IndexError(index)
        return frame[..., [2, 1, 0]]


def load_frame(video_path: Path, frame_id: int) -> np.ndarray:
    reader = FrameReader(video_path) if Path(video_path).is_dir() else VideoFrameReader(video_path)
    if frame_id >= len(reader):
        print(f"WARNING: Frame {frame_id} out of bounds for video with length {len(reader)}")
        frame_id = len(reader) - 1
    return reader[frame_id]
