"""Incremental best-snapshot export semantics (scripts/overfit.py).

The overfit harness exports the best held-out snapshot AS SOON as it
improves (so a tunnel outage mid-run cannot lose the trained model) and
must then skip the end-of-run re-save of the same step — Orbax refuses
to save a step that already exists. These tests pin the CheckpointManager
contract that logic relies on.
"""

import numpy as np


def _payload(val: float):
    return {"g_variables": {"params": {"w": np.full((2, 2), val)}}}


def test_incremental_saves_then_skip_double_save(tmp_path):
    from megaportraits_tpu.core.checkpoint import CheckpointManager

    d = str(tmp_path / "export")
    # Two improvements -> two incremental exports via fresh managers
    # (the overfit loop opens/closes a manager per improvement).
    for step, val in ((50, 0.5), (100, 1.0)):
        mgr = CheckpointManager(d)
        mgr.save(step, _payload(val), wait=True)
        mgr.close()

    # End-of-run: best step already on disk -> the guard must skip.
    mgr = CheckpointManager(d)
    assert mgr.latest_step() == 100
    mgr.close()

    # Restore returns the LAST (best) snapshot, not the first.
    mgr = CheckpointManager(d)
    out = mgr.restore(_payload(0.0))
    mgr.close()
    np.testing.assert_allclose(out["g_variables"]["params"]["w"], 1.0)


def test_final_state_export_lands_beside_best(tmp_path):
    """When best_step != final step, overfit also writes <export>_final;
    both must restore independently."""
    from megaportraits_tpu.core.checkpoint import CheckpointManager

    best_dir = str(tmp_path / "export")
    mgr = CheckpointManager(best_dir)
    mgr.save(100, _payload(1.0), wait=True)
    mgr.close()

    mgr = CheckpointManager(best_dir.rstrip("/") + "_final")
    mgr.save(800, _payload(8.0), wait=True)
    mgr.close()

    mgr = CheckpointManager(best_dir)
    best = mgr.restore(_payload(0.0))
    mgr.close()
    mgr = CheckpointManager(best_dir + "_final")
    final = mgr.restore(_payload(0.0))
    mgr.close()
    np.testing.assert_allclose(best["g_variables"]["params"]["w"], 1.0)
    np.testing.assert_allclose(final["g_variables"]["params"]["w"], 8.0)
