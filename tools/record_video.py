"""Webcam capture to a video file.

Equivalent of reference tools/record_video.py:1-32.

    python tools/record_video.py --out output.avi --seconds 10
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="output.avi")
    p.add_argument("--camera", type=int, default=0)
    p.add_argument("--seconds", type=float, default=10.0)
    args = p.parse_args()

    import cv2

    cap = cv2.VideoCapture(args.camera)
    if not cap.isOpened():
        raise SystemExit(f"cannot open camera {args.camera}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"XVID"), fps, (w, h))
    n = int(fps * args.seconds)
    for _ in range(n):
        ok, frame = cap.read()
        if not ok:
            break
        writer.write(frame)
    writer.release()
    cap.release()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
