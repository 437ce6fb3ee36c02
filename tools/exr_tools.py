"""EXR capture tooling: convert to displayable PNG, apply mattes, solve
white balance from a color checker.

Covers the offline halves of the reference's img/exr_utils.py,
matte/matte_utils.py (the EXR->PNG conversion + mask application; the SAM/
GroundingDINO matte inference itself is an external model, see README) and
img/determineWB.py — with the researcher's hard-coded capture paths
replaced by arguments.

Subcommands:
  convert <in.exr> <out.png> [--wb a,b,c,...9]    demosaic+expose+sRGB
  mask <image.png> <mask.png> <out.png> [--bg black|white]
  wb <colorchecker.exr> [--crop l,u,r,b] [--patch0 x0,y0,x1,y1]
     [--delta 150] — least-squares cam2rgb solve against the standard
     24-patch Macbeth reference colors
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raw_ngp_tpu.data.image_io import apply_mask, load_exr_image  # noqa: E402
from raw_ngp_tpu.postprocess.raw import (                          # noqa: E402
    bilinear_demosaic,
    linear_to_srgb,
)

# standard 24-patch Macbeth ColorChecker sRGB reference values
MACBETH = np.array([
    [115, 82, 68], [194, 150, 130], [98, 122, 157], [87, 108, 67],
    [133, 128, 177], [103, 189, 170], [214, 126, 44], [80, 91, 166],
    [193, 90, 99], [94, 60, 108], [157, 188, 64], [224, 163, 46],
    [56, 61, 150], [70, 148, 73], [175, 54, 60], [231, 199, 31],
    [187, 86, 149], [8, 133, 161], [243, 243, 242], [200, 200, 200],
    [160, 160, 160], [122, 122, 121], [85, 85, 85], [52, 52, 52],
], dtype=np.float64) / 255.0


def convert_exr_to_png(exr_path: str, png_path: str,
                       wb: np.ndarray | None = None,
                       percentile: float = 99.99) -> bool:
    """Demosaic -> optional WB -> percentile expose -> sRGB -> 8-bit PNG
    (matte_utils.py:21-58)."""
    import imageio.v2 as iio

    image = load_exr_image(exr_path).astype(np.float32)
    if image.ndim == 2:
        image = bilinear_demosaic(image)
    if wb is not None:
        image = image @ np.asarray(wb, np.float64).T
    exposure = np.percentile(image, percentile)
    image = linear_to_srgb(np.clip(image / max(exposure, 1e-12), 0, 1))
    iio.imwrite(png_path, (np.clip(image, 0, 1) * 255).astype(np.uint8))
    return True


def solve_wb(checker_path: str, crop=(2280, 1065, 2890, 1982),
             rotate_deg: float = -90.0, patch0=(60, 50, 140, 130),
             delta: float = 150.0,
             black: float = 0.0, white: float = 1.0) -> np.ndarray:
    """Least-squares 3x3 cam->rgb solve from a captured color checker
    (img/image_utils.py:263-363 determine_wb, generalized): average each
    of the 24 patches, then solve ``cam @ M.T ~= MACBETH``."""
    from PIL import Image

    image = load_exr_image(checker_path).astype(np.float32)
    img = Image.fromarray(image)
    img = img.crop(crop).rotate(rotate_deg, expand=True)
    image = (np.asarray(img, np.float32) - black) / (white - black)
    if image.ndim == 2:
        image = bilinear_demosaic(image)

    x0, y0, x1, y1 = patch0
    cam = np.zeros((24, 3))
    idx = 0
    for row in range(4):
        for col in range(6):
            xs = slice(int(x0 + row * delta), int(x1 + row * delta))
            ys = slice(int(y0 + col * delta), int(y1 + col * delta))
            cam[idx] = image[xs, ys].reshape(-1, 3).mean(axis=0)
            idx += 1
    # rows of M map camera RGB -> reference RGB
    M, *_ = np.linalg.lstsq(cam, MACBETH, rcond=None)
    return M.T


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert")
    c.add_argument("exr")
    c.add_argument("png")
    c.add_argument("--wb", type=str, default=None,
                   help="9 comma-separated cam2rgb entries")
    c.add_argument("--percentile", type=float, default=99.99)

    m = sub.add_parser("mask")
    m.add_argument("image")
    m.add_argument("mask")
    m.add_argument("out")
    m.add_argument("--bg", default="black", choices=["black", "white"])

    w = sub.add_parser("wb")
    w.add_argument("checker")
    w.add_argument("--crop", type=str, default="2280,1065,2890,1982")
    w.add_argument("--patch0", type=str, default="60,50,140,130")
    w.add_argument("--delta", type=float, default=150.0)

    args = p.parse_args(argv)
    if args.cmd == "convert":
        wb = None
        if args.wb:
            wb = np.array([float(v) for v in args.wb.split(",")]).reshape(3, 3)
        convert_exr_to_png(args.exr, args.png, wb, args.percentile)
        print(f"wrote {args.png}")
    elif args.cmd == "mask":
        import imageio.v2 as iio
        img = np.asarray(iio.imread(args.image), np.float32) / 255.0
        mask = np.asarray(iio.imread(args.mask))
        out = apply_mask(img[..., :3], mask, args.bg)
        iio.imwrite(args.out, (np.clip(out, 0, 1) * 255).astype(np.uint8))
        print(f"wrote {args.out}")
    elif args.cmd == "wb":
        crop = tuple(int(v) for v in args.crop.split(","))
        patch0 = tuple(int(v) for v in args.patch0.split(","))
        M = solve_wb(args.checker, crop=crop, patch0=patch0,
                     delta=args.delta)
        print("cam2rgb =")
        print(np.array2string(M, precision=8))
        return M


if __name__ == "__main__":
    main()
