"""Single-image / directory / video inference demo.

Equivalent of reference tools/inference.py:27-246: resize + normalise a
frame, forward, decode, scale predictions to the input image, render the
skeleton overlay; video mode writes ``pred_results.mp4`` +
``pose2d_pred.txt``.

    python tools/inference.py --cfg <exp.yaml> --model_path <ckpt> \
        --image_path /root/reference/test_images/00000.png --out_dir /tmp/out
"""

from __future__ import annotations

import os

from _common import base_parser, load_cfg, setup_platform


def predict_one_img(fwd, variables, img_bgr, cfg):
    import cv2
    import jax.numpy as jnp
    import numpy as np

    from hrnet_hand_pose_estimation_tpu.data.transforms import normalize_image

    size = int(cfg.MODEL.IMAGE_SIZE[0])
    hm = int(cfg.MODEL.HEATMAP_SIZE[0])
    rgb = cv2.cvtColor(cv2.resize(img_bgr, (size, size)), cv2.COLOR_BGR2RGB)
    inp = jnp.asarray(normalize_image(rgb)[None])
    heatmaps, pose2d = fwd(variables, inp)
    # scale heatmap coords to the resized input (reference inference.py:139)
    hm_out = None if heatmaps is None else np.asarray(heatmaps)[0]
    return np.asarray(pose2d)[0] * (size / hm), hm_out


def draw_skeleton(img_bgr, pose2d):
    import cv2

    from hrnet_hand_pose_estimation_tpu.data.legends import BONE_PARENTS, BONE_CHILDREN

    colors = [(0, 0, 255), (0, 255, 0), (255, 0, 0), (0, 255, 255), (255, 0, 255)]
    for b, (p, c) in enumerate(zip(BONE_PARENTS, BONE_CHILDREN)):
        p1 = tuple(int(v) for v in pose2d[p])
        p2 = tuple(int(v) for v in pose2d[c])
        cv2.line(img_bgr, p1, p2, colors[b // 4], 2)
    for u, v in pose2d.astype(int):
        cv2.circle(img_bgr, (u, v), 3, (255, 255, 255), -1)
    return img_bgr


def make_serving_fn(cfg, variables, mode: str, calib_images, interpret: bool,
                    calib_path: str = ""):
    """Build the forward for --serving: 'std' (plain model forward), 'fast'
    (bf16 Pallas fast path), 'int8' (W8A8 trunk + Pallas layer1 chain +
    stem2, calibrated on the provided frames — the serving contract is
    calibration data ~ serving data; or on a saved ``--calib`` record from
    tools/calibrate.py).  All return (heatmaps_or_None, pose2d) in heatmap
    pixels like make_forward_fn."""
    import jax.numpy as jnp
    import numpy as np

    if not cfg.MODEL.HEATMAP_SOFTMAX:
        raise SystemExit(
            "--serving fast/int8 decode via the fused softmax soft-argmax "
            "head; this config has MODEL.HEATMAP_SOFTMAX: false — use "
            "--serving std")
    if mode == "fast":
        from hrnet_hand_pose_estimation_tpu.core.fast_infer import (
            make_fast_infer)

        fast = make_fast_infer(cfg, pallas_layer1=not interpret,
                               interpret=interpret)
        return lambda v, x: (None, fast(v, x))
    if mode == "int8":
        from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
            calibrate, load_calibration, make_quant_infer,
            prepare_serving_qparams)

        if calib_path:
            amax = load_calibration(calib_path, cfg)
        else:
            amax = calibrate(cfg, variables, [np.stack(calib_images)])
        qparams = prepare_serving_qparams(cfg, variables, amax)
        qfn = make_quant_infer(cfg, interpret=interpret,
                               pallas_layer1=not interpret)
        return lambda v, x: (None, qfn(v, qparams, x))
    raise SystemExit(f"unknown --serving mode: {mode}")


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--image_path", default="", help="image file or directory")
    p.add_argument("--video_path", default="", help="video file")
    p.add_argument("--out_dir", default="inference_out")
    p.add_argument("--serving", default="std",
                   choices=("std", "fast", "int8"),
                   help="forward path: std model, bf16 Pallas fast path, or "
                        "the calibrated int8 W8A8 serving trunk")
    p.add_argument("--calib", default="",
                   help="saved calibration record (tools/calibrate.py) for "
                        "--serving int8; skips on-the-fly calibration")
    args = p.parse_args()
    setup_platform(args.platform)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import load_pretrained
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import make_forward_fn

    cfg = load_cfg(args)
    model = build_model(cfg)
    size = int(cfg.MODEL.IMAGE_SIZE[0])

    if args.model_path:
        variables = load_pretrained(args.model_path)
    else:
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.key(0), jnp.zeros((1, size, size, 3)), False)
    if args.serving == "std":
        fwd = make_forward_fn(cfg, model)
    else:
        from hrnet_hand_pose_estimation_tpu.data.transforms import (
            normalize_image)

        # calibration frames for int8 = the first few serving inputs
        # ('fast' needs none, and a saved --calib record replaces them)
        calib = []
        if args.serving == "int8" and args.calib:
            pass
        elif args.serving == "int8" and args.video_path:
            cap = cv2.VideoCapture(args.video_path)
            while len(calib) < 8:
                ok, frame = cap.read()
                if not ok:
                    break
                rgb = cv2.cvtColor(cv2.resize(frame, (size, size)),
                                   cv2.COLOR_BGR2RGB)
                calib.append(normalize_image(rgb))
            cap.release()
        elif args.serving == "int8" and args.image_path:
            cand = ([os.path.join(args.image_path, f)
                     for f in sorted(os.listdir(args.image_path))]
                    if os.path.isdir(args.image_path) else [args.image_path])
            for path in cand[:8]:
                img = cv2.imread(path)
                if img is None:
                    continue
                rgb = cv2.cvtColor(cv2.resize(img, (size, size)),
                                   cv2.COLOR_BGR2RGB)
                calib.append(normalize_image(rgb))
        if args.serving == "int8" and not calib and not args.calib:
            raise SystemExit("--serving int8 needs at least one input to "
                             "calibrate on (or a saved --calib record)")
        interpret = jax.devices()[0].platform == "cpu"
        fwd = make_serving_fn(cfg, variables, args.serving, calib, interpret,
                              calib_path=args.calib)

    os.makedirs(args.out_dir, exist_ok=True)

    if args.video_path:
        cap = cv2.VideoCapture(args.video_path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 25
        writer = None
        poses = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            pose2d, _ = predict_one_img(fwd, variables, frame, cfg)
            canvas = draw_skeleton(cv2.resize(frame, (size, size)), pose2d)
            if writer is None:
                writer = cv2.VideoWriter(
                    os.path.join(args.out_dir, "pred_results.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size))
            writer.write(canvas)
            poses.append(pose2d.reshape(-1))
        if writer:
            writer.release()
        np.savetxt(os.path.join(args.out_dir, "pose2d_pred.txt"), np.stack(poses))
        print(f"wrote {len(poses)} frames to {args.out_dir}")
        return

    paths = []
    if os.path.isdir(args.image_path):
        paths = [os.path.join(args.image_path, f) for f in sorted(os.listdir(args.image_path))
                 if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    elif args.image_path:
        paths = [args.image_path]
    if not paths:
        raise SystemExit("--image_path or --video_path required")

    for path in paths:
        img = cv2.imread(path)
        pose2d, heatmaps = predict_one_img(fwd, variables, img, cfg)
        canvas = draw_skeleton(cv2.resize(img, (size, size)), pose2d)
        out_path = os.path.join(args.out_dir, "pred_" + os.path.basename(path))
        cv2.imwrite(out_path, canvas)
        print(f"{path}: wrote {out_path}; wrist at {pose2d[0].round(1).tolist()}")


if __name__ == "__main__":
    main()
