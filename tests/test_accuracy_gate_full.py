"""Full-size decode-level int8 gate (tools/accuracy_gate_full.py) as a
TPU-tier test: train the flagship w32@256 a few hundred synthetic steps
on-device, then require the shipped serving config to decode within 0.1 px
of the f32 walk (the reference's accuracy contract is end-to-end metrics
on trained nets, reference tools/evaluate_2D.py:268-274).

Marked ``tpu``: the XLA:CPU backend takes hours on the full train-step
graph, so this only runs against real TPU hardware (and is additionally
skipped unless a TPU is actually visible)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
@pytest.mark.slow
def test_full_size_int8_decode_gate():
    import jax

    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs real TPU hardware (hour-scale compile on XLA:CPU)")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from accuracy_gate_full import run

    results = run()
    assert results["pass"], results
    for k, v in results.items():
        if k.startswith("shift_"):
            assert v < 0.1, f"{k} = {v:.4f} px >= 0.1 px"
