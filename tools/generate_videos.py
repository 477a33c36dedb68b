"""Render dataset samples into videos.

Equivalent of reference tools/generate_videos.py:37-57 (which calls
FreiHandDataset.generate_videos): draws GT skeletons over consecutive
samples and writes a video per chunk.

    python tools/generate_videos.py --cfg <exp.yaml> --platform cpu --out_dir videos/
"""

from __future__ import annotations

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--out_dir", default="videos")
    p.add_argument("--frames_per_video", type=int, default=100)
    p.add_argument("--max_videos", type=int, default=1)
    args = p.parse_args()
    setup_platform(args.platform)

    import os

    import cv2
    import numpy as np

    from hrnet_hand_pose_estimation_tpu.data.build import build_dataset
    from hrnet_hand_pose_estimation_tpu.data.transforms import denormalize_image
    from hrnet_hand_pose_estimation_tpu.utils.vis import draw_hand

    cfg = load_cfg(args)
    name = list(cfg.DATASET.TEST_DATASET)[0]
    ds = build_dataset(cfg, name, is_train=False)
    os.makedirs(args.out_dir, exist_ok=True)

    size = int(cfg.MODEL.IMAGE_SIZE[0])
    hm = float(cfg.MODEL.HEATMAP_SIZE[0])
    idx = 0
    for v in range(args.max_videos):
        path = os.path.join(args.out_dir, f"VIDEO_{v:06d}.avi")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"XVID"), 25,
                                 (size, size))
        for _ in range(min(args.frames_per_video, len(ds) - idx)):
            s = ds[idx]
            idx += 1
            img = cv2.cvtColor(denormalize_image(np.asarray(s["imgs"])),
                               cv2.COLOR_RGB2BGR).copy()
            pose = np.asarray(s["pose2d"])[:, :2] * (size / hm)
            writer.write(draw_hand(img, pose))
        writer.release()
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
