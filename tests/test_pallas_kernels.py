"""Pallas kernel parity (interpreter mode on CPU) vs the XLA compositions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops.decode import soft_argmax, spatial_softmax
from hrnet_hand_pose_estimation_tpu.ops.pallas.decode_kernel import (
    fused_gaussian_targets,
    fused_softmax_decode,
)
from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets


def test_fused_decode_matches_xla(rng):
    logits = jnp.asarray(rng.normal(size=(3, 16, 16, 21)).astype(np.float32)) * 3.0
    for temp in (1.0, 2.5):
        want = np.asarray(soft_argmax(spatial_softmax(logits, temp)))
        got = np.asarray(fused_softmax_decode(logits, temp, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_decode_bf16_input(rng):
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    got = np.asarray(fused_softmax_decode(logits.astype(jnp.bfloat16), 1.0,
                                          interpret=True))
    want = np.asarray(soft_argmax(spatial_softmax(logits.astype(jnp.bfloat16), 1.0)))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_fused_targets_match_xla(rng):
    joints = jnp.asarray(rng.uniform(-3, 19, size=(4, 21, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(4, 21)) > 0.3).astype(np.float32))
    for sigma in (1.0, 2.0):
        want = np.asarray(gaussian_targets(joints, vis, 16, sigma))
        got = np.asarray(fused_gaussian_targets(joints, vis, 16, sigma,
                                                interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)
