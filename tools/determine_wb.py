"""CLI for the color-checker white-balance solve (reference
img/determineWB.py + image_utils.py:263-363, with the hard-coded capture
path/crop promoted to arguments).

Usage:
  python tools/determine_wb.py chart.exr --crop 2280 1065 2890 1982 \
      --rot90 -1 --black 0 --white 4095 --mosaiced -o wb.npy
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image", help="linear color-checker capture (EXR/npy)")
    ap.add_argument("--crop", type=int, nargs=4, default=None,
                    metavar=("LEFT", "UPPER", "RIGHT", "LOWER"))
    ap.add_argument("--rot90", type=int, default=0,
                    help="clockwise 90-degree turns (reference uses -1)")
    ap.add_argument("--black", type=float, default=0.0)
    ap.add_argument("--white", type=float, default=1.0)
    ap.add_argument("--mosaiced", action="store_true")
    ap.add_argument("--first_patch", type=int, nargs=4,
                    default=(60, 50, 140, 130))
    ap.add_argument("--spacing", type=float, default=150.0)
    ap.add_argument("-o", "--out", default="wb.npy")
    args = ap.parse_args()

    if args.image.endswith(".npy"):
        img = np.load(args.image)
    else:
        import imageio.v2 as iio
        img = iio.imread(args.image)

    from raw_ngp_tpu.postprocess import determine_wb
    mat = determine_wb(img, black_level=args.black, white_level=args.white,
                       crop=tuple(args.crop) if args.crop else None,
                       rot90=args.rot90, mosaiced=args.mosaiced,
                       first_patch=tuple(args.first_patch),
                       spacing=args.spacing)
    np.save(args.out, mat)
    print("color matrix:")
    print(mat)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
