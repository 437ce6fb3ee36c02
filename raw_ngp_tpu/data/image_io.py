"""Image loading: LDR (png/jpg) and HDR (EXR / DNG) with RAW metadata.

Redesign of the reference's load_images (img/image_utils.py:38-241). The
reference returns images and smuggles per-image metadata through the
mutable ``opt.metadict``; here loading returns ``(images, ImageMetadata)``
explicitly.

Key constants preserved for parity:
  * light-stage black level 0.00024420026 / white level 1.0 in --clip mode
    (image_utils.py:140-148)
  * the light-stage cam2rgb matrix x 255 for EXR captures
    (image_utils.py:217-222)
  * bracketing shutter speed parsed from the ``_e<micros>`` filename suffix
    (image_utils.py:92-94), relative exposure = shutter / max shutter
    (image_utils.py:107-121)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from raw_ngp_tpu.postprocess.raw import bilinear_demosaic, linear_to_srgb

# lightstage measured black/white levels (image_utils.py:142-143)
LIGHTSTAGE_BLACKLEVEL = 0.00024420026
LIGHTSTAGE_WHITELEVEL = 1.0

# lightstage EXR color matrix (image_utils.py:219-222), stored x255
LIGHTSTAGE_CAM2RGB = np.array(
    [[0.00689549, -0.00128842, -0.00071225],
     [-0.00200243, 0.00597485, -0.00057672],
     [0.00040781, -0.0030018, 0.00672216]]) * 255.0

# linear RGB -> XYZ (image_utils.py _RGB2XYZ constant; standard sRGB D65)
RGB2XYZ = np.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
])


@dataclass
class ImageMetadata:
    """Per-image metadata extracted during loading (replaces opt.metadict)."""

    filenames: List[str] = field(default_factory=list)
    shutter_speeds: List[float] = field(default_factory=list)
    cam2rgb: List[np.ndarray] = field(default_factory=list)
    ldirs: List[np.ndarray] = field(default_factory=list)
    exposure_idx: Optional[np.ndarray] = None
    exposure_values: Optional[np.ndarray] = None
    unique_shutters: Optional[np.ndarray] = None

    def finalize_exposures(self):
        """Relative exposures with 1.0 = brightest (image_utils.py:107-121)."""
        ss = np.array(self.shutter_speeds, dtype=np.float64)
        if len(ss) == 0:
            return
        unique = np.sort(np.unique(ss))[::-1]
        idx = np.zeros(len(ss), np.int32)
        for i, s in enumerate(unique):
            idx[ss == s] = i
        self.exposure_idx = idx
        self.unique_shutters = unique
        self.exposure_values = (ss / unique[0]).astype(np.float32)


def _resize(img, H, W):
    import cv2
    if img.shape[0] != H or img.shape[1] != W:
        return cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
    return img


def load_ldr_image(path: str, H: int, W: int) -> np.ndarray:
    """png/jpg -> float [H, W, 3/4] in [0, 1] (image_utils.py:52-65)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    if img.shape[-1] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    elif img.shape[-1] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    img = _resize(img, H, W)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)


def load_exr_image(path: str) -> np.ndarray:
    """EXR via imageio (or cv2 fallback)."""
    try:
        import imageio.v2 as iio
        return np.asarray(iio.imread(path)).astype(np.float32)
    except Exception:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise
        if img.ndim == 3 and img.shape[-1] >= 3:
            img = cv2.cvtColor(img[..., :3], cv2.COLOR_BGR2RGB)
        return img.astype(np.float32)


def load_dng_raw(path: str) -> np.ndarray:
    """Raw sensor mosaic from a DNG (image_utils.py:129-131). Requires
    rawpy; raises ImportError with guidance otherwise."""
    try:
        import rawpy
    except ImportError as e:
        raise ImportError(
            "rawpy is required for DNG captures; convert to EXR or install "
            "rawpy") from e
    with open(path, "rb") as f:
        return rawpy.imread(f).raw_image.astype(np.float32)


def dng_cam2rgb(exif: dict) -> np.ndarray:
    """Color matrix from DNG EXIF (image_utils.py:204-214): white-balance
    diagonal + ColorMatrix2-derived rgb2cam inverse."""
    wb = np.array(str(exif["AsShotNeutral"]).split()).astype(float)
    cam2camwb = np.diag(1.0 / wb)
    xyz2camwb = np.array(str(exif["ColorMatrix2"]).split()).astype(
        float).reshape(3, 3)
    rgb2camwb = xyz2camwb @ RGB2XYZ
    rgb2camwb /= rgb2camwb.sum(axis=-1, keepdims=True)
    return np.linalg.inv(rgb2camwb) @ cam2camwb


def apply_mask(image: np.ndarray, mask: np.ndarray,
               background: str) -> np.ndarray:
    """SAM-matte mask application (image_utils.py:174-202): background
    pixels become 0 (black) or 1 (white)."""
    if mask.ndim == 3:
        mask = mask[..., 0]
    bg = 0.0 if background == "black" else 1.0
    return np.where(mask[..., None] > 0, image, bg).astype(np.float32)


def mosaic_to_3ch(image: np.ndarray) -> np.ndarray:
    """Keep Bayer data mosaiced but expand to 3 channels with zeros at
    unobserved sites (image_utils.py:157-163) — pairs with the Bayer loss
    mask during training."""
    rgb = np.zeros((*image.shape[:2], 3), np.float32)
    rgb[0::2, 0::2, 0] = image[0::2, 0::2]
    rgb[0::2, 1::2, 1] = image[0::2, 1::2]
    rgb[1::2, 0::2, 1] = image[1::2, 0::2]
    rgb[1::2, 1::2, 2] = image[1::2, 1::2]
    return rgb


def load_hdr_image(
    path: str,
    H: int,
    W: int,
    clip: bool = True,
    mosaiced: bool = False,
    masked: bool = False,
    mask_dir: Optional[str] = None,
    background: str = "black",
    expose: bool = False,
    exposure_percentile: float = 99.0,
    exif: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One HDR capture -> (linear image [H, W, 3], cam2rgb [3, 3])
    (image_utils.py:125-238)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "exr":
        image = load_exr_image(path)
        cam2rgb = LIGHTSTAGE_CAM2RGB.copy()
    else:
        image = load_dng_raw(path)
        if exif is None:
            with open(path.rsplit(".", 1)[0] + ".json", "rb") as f:
                exif = json.load(f)[0]
        cam2rgb = dng_cam2rgb(exif)

    from raw_ngp_tpu import native

    image = image.astype(np.float32)
    if clip:
        black, white = LIGHTSTAGE_BLACKLEVEL, LIGHTSTAGE_WHITELEVEL
    else:
        assert exif is not None, "--clip off requires EXIF black/white level"
        black, white = float(exif["BlackLevel"]), float(exif["WhiteLevel"])
    image = native.normalize_levels(image, black, white, clip=clip)

    if image.ndim == 2 and not mosaiced:
        image = native.demosaic_rggb(image)
    image = _resize(image, H, W)
    if mosaiced and image.ndim == 2:
        image = mosaic_to_3ch(image)

    if masked and mask_dir is not None:
        base = os.path.splitext(os.path.basename(path))[0]
        base = base.split("_e")[0].split("_l")[0]
        mask_path = os.path.join(mask_dir, base + ".png")
        import imageio.v2 as iio
        mask = _resize(np.asarray(iio.imread(mask_path)), H, W)
        image = apply_mask(image, mask, background)

    if expose:
        rgb_linear = image @ cam2rgb.T
        exposure = np.percentile(rgb_linear, exposure_percentile)
        image = linear_to_srgb(np.clip(rgb_linear / exposure, 0, 1))

    return image.astype(np.float32), cam2rgb


def parse_shutter_from_name(path: str, bracketing: bool) -> float:
    """Shutter (seconds) from the ``_e<micros>`` suffix
    (image_utils.py:92-94); 1.0 when not bracketing."""
    if not bracketing:
        return 1.0
    stem = path.rsplit(".", 1)[0]
    return float(stem.split("e")[-1]) / 1_000_000.0


def parse_led_from_name(path: str) -> int:
    """LED id from the ``_l<led>`` suffix (image_utils.py:79-80)."""
    return int(path.rsplit(".", 1)[0].split("l")[-1])
