"""Child process for the 2-process multi-host integration test
(tests/test_multihost.py).  Joins a jax.distributed CPU cluster (2
processes x 4 virtual devices), builds the GLOBAL 8-device mesh, iterates
its host-local DataLoader slice, assembles global batches via
``shard_batch`` (make_array_from_process_local_data) and runs real train
steps — the reference's torch.distributed DDP + DistributedSampler
protocol (reference tools/train.py:221-249, lib/dataset/build.py:78-83).

Usage: multihost_child.py <process_id> <coordinator_port>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address=f"localhost:{sys.argv[2]}",
                           num_processes=2, process_id=pid)

import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.data.pipeline import DataLoader
from hrnet_hand_pose_estimation_tpu.data.synthetic import SyntheticDataset
from hrnet_hand_pose_estimation_tpu.models import build_model
from hrnet_hand_pose_estimation_tpu.parallel.mesh import make_mesh, shard_batch
from hrnet_hand_pose_estimation_tpu.parallel.train_step import (
    create_train_state, make_train_step)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cfg = load_config(os.path.join(REPO, "experiments/synthetic_smoke.yaml"))
model = build_model(cfg)
mesh = make_mesh(("data",), (8,))
assert jax.process_count() == 2 and jax.device_count() == 8

ds = SyntheticDataset(length=16, img_size=64, hm_size=16)
# batch_size is PER-HOST under multi-host slicing (global batch 8)
dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0, seed=7)
dl.epoch = 0
local_idx = dl._index_order().tolist()

losses = []
state = step = None
for batch_np in dl:
    batch = {
        "images": batch_np["imgs"],
        "target_heatmaps": batch_np["heatmaps"],
        "pose2d": batch_np["pose2d"],
        "visibility": np.ones((len(batch_np["imgs"]), 21), np.float32),
    }
    gbatch = shard_batch(mesh, batch)
    assert gbatch["images"].shape[0] == 8  # global batch assembled
    if state is None:
        state, tx = create_train_state(cfg, model, jax.random.key(0),
                                       batch, mesh)
        step = make_train_step(cfg, model, tx, mesh)
    state, loss_dict = step(state, gbatch)
    losses.append(float(loss_dict["total_loss"]))

print("RESULT " + json.dumps({"pid": pid, "losses": losses,
                              "idx": local_idx}), flush=True)
