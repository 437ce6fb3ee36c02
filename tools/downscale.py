"""Image downscaler: <root>/images -> <root>/images_<factor>.

Equivalent of the reference's scripts/downscale.py (29 LoC, PIL-based).

Usage: python tools/downscale.py <root> --factor 4 [--folder images]
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("root", type=str)
    p.add_argument("--factor", type=int, default=4)
    p.add_argument("--folder", type=str, default="images")
    args = p.parse_args(argv)

    src = os.path.join(args.root, args.folder)
    dst = os.path.join(args.root, f"{args.folder}_{args.factor}")
    os.makedirs(dst, exist_ok=True)
    n = 0
    for path in sorted(glob.glob(os.path.join(src, "*"))):
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        H, W = img.shape[:2]
        small = cv2.resize(img, (W // args.factor, H // args.factor),
                           interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(dst, os.path.basename(path)), small)
        n += 1
    print(f"downscaled {n} images {args.factor}x into {dst}")


if __name__ == "__main__":
    main()
