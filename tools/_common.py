"""Shared CLI plumbing for the tools (arg parsing, path setup, platform)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_parser(description: str) -> argparse.ArgumentParser:
    """Common flags mirroring the reference tools (tools/train.py:57-92)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cfg", required=True, help="experiment YAML")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="dotted config overrides: KEY VALUE [KEY VALUE ...]")
    p.add_argument("--model_path", default="", help="checkpoint to load")
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu"],
                   help="force a JAX platform (cpu for smoke runs)")
    p.add_argument("--batch_size", type=int, default=0)
    return p


def setup_platform(platform: str) -> None:
    import jax

    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")


def load_cfg(args):
    from hrnet_hand_pose_estimation_tpu.config import load_config

    return load_config(args.cfg, opts=args.opts)
