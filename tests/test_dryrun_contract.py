"""Cold-cache regression test for the driver dryrun contract.

Round 3 regressed `MULTICHIP_r03.json` to a timeout with an empty tail
because the dryrun's stage packing assumed a warm compile cache and its
child buffered all output (`capture_output=True`).  This test runs
``dryrun_multichip(8)`` exactly the way the driver does — a fresh process,
a FRESH compile-cache directory, a hard wall-clock window — and asserts:

- rc == 0 on the dryrun's OWN schedule (the kill is never the terminator),
- the minimum contract (tiny-2D sharded train step EXECUTED) is printed,
- stages that do not fit the reduced window are SKIPPED with a reason.

Matches the externally visible proof of the reference's DDP capability
(reference tools/train.py:221-249).
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__graft_entry__.py")

# The empirical driver-kill calibration: two consecutive rc=124 artifacts
# (MULTICHIP_r03/r04) measured the kill landing ~1500 s after PROCESS START.
# Worst observed parent+child startup (jax + TPU-tunnel import on a 1-CPU
# host) is ~120 s; the default schedule must fit under the kill with that
# startup already charged to the window.
OBSERVED_KILL_S = 1500
WORST_STARTUP_S = 120


def _source():
    with open(ENTRY) as f:
        return f.read()


# ---- driver-window scheduler-math regression tests (fast tier) -----------
# These pin the exact decisions whose absence produced the round-3 and
# round-4 rc=124 artifacts.  They run against the pure helpers, so they are
# cheap enough for the default suite.


def test_default_window_fits_observed_driver_kill():
    src = _source()
    m = re.search(r'GRAFT_DRYRUN_WINDOW_S",\s*"(\d+)"', src)
    assert m, "default window literal not found"
    window = int(m.group(1))
    # round-4 failure: window 1500 == the observed kill itself, leaving zero
    # room for startup.  The default must fit startup + window + teardown
    # strictly under the observed kill.
    assert window + WORST_STARTUP_S < OBSERVED_KILL_S, (
        f"default window {window}s + {WORST_STARTUP_S}s worst startup must "
        f"stay under the observed ~{OBSERVED_KILL_S}s driver kill")


def test_deadline_anchored_at_module_import_before_jax():
    # round-4 failure: deadline stamped at respawn time, AFTER the parent
    # paid the jax/TPU-tunnel import the driver's clock had already charged.
    src = _source()
    anchor = src.index("_T0 = time.time()")
    jax_import = src.index("\nimport jax")
    assert anchor < jax_import, (
        "_T0 window anchor must be stamped before the first jax import")


def test_full_exec_never_budgeted_the_entire_remainder():
    import __graft_entry__ as g

    for left in (240, 500, 1000, 2000):
        budget, _ = g._plan_full_exec(left, warm_s=100.0)
        if budget is not None:
            # round-4 failure: budget == left (no teardown reserve)
            assert budget <= left - 150, (left, budget)


def test_full_exec_blind_cold_attempt_refused():
    import __graft_entry__ as g

    # rounds 3-4: a cold attempt (no evidence the compiled step is cached)
    # was launched with the whole remainder and the driver killed it.
    budget, reason = g._plan_full_exec(10_000, warm_s=None)
    assert budget is None
    assert "warm-cache marker" in reason


def test_full_exec_requires_headroom_over_measurement():
    import __graft_entry__ as g

    budget, _ = g._plan_full_exec(1000, warm_s=600.0)
    assert budget is None, "820s budget < 1.5x 600s measured must skip"
    budget, _ = g._plan_full_exec(1000, warm_s=400.0)
    assert budget == 1000 - g._EXEC_RESERVE_S


def test_parent_backstop_bounded_by_child_deadline():
    import __graft_entry__ as g

    now = 1_000_000.0
    for left in (90.0, 400.0, 1200.0):
        wait = g._parent_backstop_s(now + left, now)
        # round-4 failure: backstop was _WINDOW_S+120 from respawn — a fixed
        # offset that could land after the driver's kill
        assert wait <= left + 45.0 + 1e-6, (left, wait)
    assert g._parent_backstop_s(now + 10.0, now) == 60.0  # reap floor


def test_worst_case_unconditional_schedule_fits():
    import __graft_entry__ as g

    # the unconditional path: startup + cold tiny-2D (145s measured, x1.5
    # slop) + margin must fit the default window; every other stage is
    # budget-gated against its estimate.
    src = _source()
    window = int(re.search(r'GRAFT_DRYRUN_WINDOW_S",\s*"(\d+)"', src).group(1))
    cold_tiny_slopped = int(145 * 1.5)
    assert WORST_STARTUP_S + cold_tiny_slopped + g._MARGIN_S < window


@pytest.mark.slow
def test_dryrun_cold_cache_minimum_contract(tmp_path):
    # 480 here gives the same effective child budget the scenario had before
    # the round-5 margin bump (window - 120s margin = 360s; cold tiny-2D is
    # 145s + parent startup) while still forcing every later stage to SKIP
    window_s = 480
    env = dict(os.environ)
    env["GRAFT_DRYRUN_WINDOW_S"] = str(window_s)
    env["GRAFT_DRYRUN_CACHE_DIR"] = str(tmp_path / "fresh_cache")
    # the driver imports the module on whatever backend it has; exercising
    # the respawn path (parent sees <8 devices -> CPU-pool child) is part of
    # the contract, so do NOT force a device pool here
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import __graft_entry__ as g; g.dryrun_multichip(8)" % REPO],
        env=env, cwd=REPO, capture_output=True, text=True,
        timeout=window_s + 240)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"dryrun rc={proc.returncode}\n{out[-4000:]}"
    assert "minimum contract OK" in out, out[-4000:]
    assert "[2D tiny topology] train step OK" in out, out[-4000:]
    # with a fresh cache and a 420s window the expensive stages must be
    # budget-SKIPPED (not attempted and killed): the schedule self-terminates
    assert "dryrun_multichip(8) OK" in out, out[-4000:]
