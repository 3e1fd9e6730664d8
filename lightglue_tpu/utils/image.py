"""Image I/O and preprocessing.

Host-side equivalents of the reference's cv2/kornia helpers
(lightglue/utils.py:12-38, 72-128): reading, RGB conversion, resizing to a
target long/short edge, and scale bookkeeping. Images are numpy/JAX arrays in
HWC float32 [0, 1] (channel-last for TPU; the reference uses CHW).

TPU twist: after resizing, ``pad_to_multiple`` replicate-pads to a stride
multiple so conv encoders (SuperPoint /8, ALIKED /32) see aligned shapes, and
the true extent travels as ``image_size`` so detections in the pad band can
be masked out (the reference instead crops per-image, sift.py:207-210).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..configs import PreprocessConfig


def read_image(path: Union[str, Path], grayscale: bool = False) -> np.ndarray:
    """Read an image as RGB (H, W, 3) or grayscale (H, W) uint8
    (reference: utils.py:72-82)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"No image at path {path}.")
    if cv2 is not None:
        mode = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
        image = cv2.imread(str(path), mode)
        if image is None:
            raise IOError(f"Could not read image at {path}.")
        if not grayscale:
            image = image[..., ::-1]
        return np.ascontiguousarray(image)
    from PIL import Image  # fallback

    img = Image.open(path)
    img = img.convert("L" if grayscale else "RGB")
    return np.asarray(img)


def numpy_image_to_array(image: np.ndarray) -> np.ndarray:
    """uint8 HWC/HW -> float32 HWC in [0,1] (reference: utils.py:85-93,
    but channel-LAST for TPU)."""
    if image.ndim == 2:
        image = image[..., None]
    elif image.ndim != 3:
        raise ValueError(f"Not an image: {image.shape}")
    return (image / 255.0).astype(np.float32)


def resize_image(
    image: np.ndarray,
    size: Union[int, Tuple[int, int]],
    fn: str = "max",
    interp: str = "area",
) -> Tuple[np.ndarray, Tuple[float, float]]:
    """Resize to a fixed size or by max/min edge; returns (image, (sx, sy))
    (reference: utils.py:96-121)."""
    h, w = image.shape[:2]
    agg = {"max": max, "min": min}[fn]
    if isinstance(size, int):
        scale = size / agg(h, w)
        h_new, w_new = int(round(h * scale)), int(round(w * scale))
    else:
        h_new, w_new = size
    sc = (w_new / w, h_new / h)
    if cv2 is not None:
        mode = {
            "linear": cv2.INTER_LINEAR,
            "cubic": cv2.INTER_CUBIC,
            "nearest": cv2.INTER_NEAREST,
            "area": cv2.INTER_AREA,
        }[interp]
        out = cv2.resize(image, (w_new, h_new), interpolation=mode)
        if image.ndim == 3 and out.ndim == 2:  # cv2 drops singleton channel
            out = out[..., None]
        return out, sc
    from PIL import Image

    resample = {"linear": Image.BILINEAR, "cubic": Image.BICUBIC,
                "nearest": Image.NEAREST, "area": Image.BILINEAR}[interp]
    arr = np.asarray(Image.fromarray(image).resize((w_new, h_new), resample))
    return arr, sc


def load_image(
    path: Union[str, Path], resize: Optional[int] = None, **kwargs
) -> np.ndarray:
    """Read + optionally resize + normalize (reference: utils.py:124-128).
    Returns float32 (H, W, 3) in [0, 1]."""
    image = read_image(path)
    if resize is not None:
        image, _ = resize_image(image, resize, **kwargs)
    return numpy_image_to_array(image)


def pad_to_multiple(
    image: np.ndarray, multiple: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Replicate-pad (H, W, C) bottom/right to a stride multiple. Returns
    (padded, (orig_h, orig_w))."""
    h, w = image.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        image = np.pad(image, [(0, ph), (0, pw), (0, 0)], mode="edge")
    return image, (h, w)


class ImagePreprocessor:
    """Resize (+ scale bookkeeping) matching reference semantics
    (utils.py:12-38). Operates host-side on numpy HWC."""

    def __init__(self, conf: PreprocessConfig = PreprocessConfig(), **overrides):
        if overrides:
            conf = conf.replace(**overrides)
        self.conf = conf

    def __call__(self, image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h, w = image.shape[:2]
        if self.conf.resize is not None:
            fn = "max" if self.conf.side == "long" else "min"
            interp = {
                "bilinear": "linear", "linear": "linear",
                "bicubic": "cubic", "cubic": "cubic",
                "nearest": "nearest", "area": "area",
            }[self.conf.interpolation]
            # kornia-style antialias: averaging filter only when downscaling
            # (reference utils.py:26-38 via kornia.geometry.resize)
            agg = max if fn == "max" else min
            downscale = self.conf.resize < agg(h, w)
            if self.conf.antialias and downscale and interp == "linear":
                interp = "area"
            image, _ = resize_image(image, self.conf.resize, fn=fn, interp=interp)
        scale = np.array(
            [image.shape[1] / w, image.shape[0] / h], np.float32
        )
        return image, scale
