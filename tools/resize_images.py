"""Batch image resize utility.

Equivalent of reference tools/resize_images.py.

    python tools/resize_images.py --src dir/ --dst out/ --size 256
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    import cv2

    os.makedirs(args.dst, exist_ok=True)
    names = [f for f in sorted(os.listdir(args.src))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    for name in names:
        img = cv2.imread(os.path.join(args.src, name))
        out = cv2.resize(img, (args.size, args.size))
        cv2.imwrite(os.path.join(args.dst, name), out)
    print(f"resized {len(names)} images -> {args.dst}")


if __name__ == "__main__":
    main()
