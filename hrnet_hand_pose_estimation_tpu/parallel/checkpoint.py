"""Checkpoint save/restore + AUTO_RESUME.

Orbax-backed replacement for the reference's torch checkpointing
(lib/utils/utils.py:107-114 save_checkpoint; resume logic
tools/train.py:161-171,287-295).  The checkpoint payload is keyed
identically in spirit: {step/epoch, params, batch_stats, opt_state,
train/valid_global_steps, best_loss} so resuming restores the exact
training trajectory.  ``best``-model snapshots mirror
tools/train.py:373-405 (lowest total validation loss wins).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, epoch: int, state: TrainState, extra: Optional[Dict[str, Any]] = None):
        # always write the full meta schema so restore templates line up
        meta = {"epoch": np.asarray(epoch), "best_loss": np.asarray(np.inf),
                "train_global_steps": np.asarray(0),
                "valid_global_steps": np.asarray(0)}
        meta.update({k: np.asarray(v) for k, v in (extra or {}).items()})
        payload = {"state": state, "meta": meta}
        self.manager.save(epoch, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: TrainState, epoch: Optional[int] = None):
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            return None
        payload = self.manager.restore(
            epoch,
            args=ocp.args.StandardRestore({
                "state": state_template,
                "meta": {"epoch": np.asarray(0), "best_loss": np.asarray(0.0),
                         "train_global_steps": np.asarray(0),
                         "valid_global_steps": np.asarray(0)},
            }),
        )
        return payload

    def save_best(self, state: TrainState) -> None:
        """Standalone best-model snapshot (reference model_best.pth.tar)."""
        path = os.path.join(self.directory, "best")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": state.params, "batch_stats": state.batch_stats},
                   force=True)
        ckptr.wait_until_finished()


def merge_pretrained(dst: dict, src: dict):
    """Copy every ``src`` leaf whose path exists in ``dst`` with a matching
    shape; leave everything else at its fresh initialisation.

    This is the reference's partial warm-start contract
    (pose_hrnet.py init_weights: filtered state_dict + ``strict=False``
    load): pretrained trunks never cover task heads, and shape-divergent
    leaves (e.g. a different NUM_JOINTS final layer) must not clobber init.
    Returns ``(merged, copied_paths, skipped_paths)``.
    """
    from collections.abc import Mapping

    copied, skipped = [], []

    def walk(d, s, path):
        out = dict(d)
        for key, sval in s.items():
            if key not in d:
                skipped.append("/".join(path + (key,)))
                continue
            dval = d[key]
            if isinstance(sval, Mapping) and isinstance(dval, Mapping):
                out[key] = walk(dval, sval, path + (key,))
            elif not isinstance(sval, Mapping) and not isinstance(dval, Mapping):
                if np.shape(sval) == np.shape(dval):
                    out[key] = jax.numpy.asarray(
                        np.asarray(sval), dtype=jax.numpy.asarray(dval).dtype)
                    copied.append("/".join(path + (key,)))
                else:
                    skipped.append("/".join(path + (key,)))
            else:
                skipped.append("/".join(path + (key,)))
        return out

    return walk(dst, src, ()), copied, skipped


def load_pretrained(path: str):
    """Load warm-start weights: an Orbax dir or a torch .pth(.tar) via the
    converter (reference MODEL.HRNET_PRETRAINED, tools/train.py:173-182)."""
    if path.endswith((".pth", ".tar", ".pt")):
        from ..utils.torch_convert import convert_checkpoint

        return convert_checkpoint(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
