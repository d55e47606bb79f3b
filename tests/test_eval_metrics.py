"""Eval-metric semantics: Procrustes AED and the memorization index
(VERDICT r4 items 5 and 6)."""

import numpy as np

from megaportraits_tpu.eval.metrics import (
    memorization_index,
    procrustes_shape_distance,
)


def _rot(deg):
    t = np.deg2rad(deg)
    return np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])


def test_procrustes_invariant_to_similarity_transform():
    rng = np.random.default_rng(0)
    shape = rng.normal(size=(68, 2))
    moved = (shape @ _rot(33).T) * 2.7 + np.array([5.0, -3.0])
    d = procrustes_shape_distance(shape, moved)
    assert d is not None and d < 1e-9, d


def test_procrustes_detects_shape_change():
    """Expression-like deformation survives alignment — the signal the raw
    AKD formula (pose+scale dominated) drowns out."""
    rng = np.random.default_rng(1)
    shape = rng.normal(size=(68, 2))
    deformed = shape.copy()
    deformed[:10] += 0.5  # move a landmark subset (mouth-open analog)
    same_pose = procrustes_shape_distance(shape, deformed)
    # identical shape at a wildly different pose/scale: ~0
    other_pose = procrustes_shape_distance(shape, shape @ _rot(80).T * 9.0)
    assert other_pose < 1e-9
    assert same_pose > 100 * max(other_pose, 1e-12), (same_pose, other_pose)


def test_procrustes_degenerate_returns_none():
    flat = np.zeros((5, 2))
    assert procrustes_shape_distance(flat, flat) is None


def test_memorization_index_flags_wrong_clip():
    """A prediction that memorized clip B must report nearest_clip B even
    when its 'task' was clip A — the Gomez-leak detector."""
    rng = np.random.default_rng(2)
    clips = {
        "clip_a": rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32),
        "clip_b": rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32),
        "clip_c": rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32),
    }
    leaked = clips["clip_b"][1] + rng.normal(0, 0.01, (8, 8, 3)).astype(
        np.float32
    )
    mi = memorization_index(leaked, clips)
    assert mi["nearest_clip"] == "clip_b"
    assert mi["nearest_l1"] < 0.05
    assert mi["margin_l1"] > 0.05
    assert set(mi["per_clip"]) == set(clips)


def test_memorization_index_clean_prediction_matches_source():
    rng = np.random.default_rng(3)
    clips = {
        "src": rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32),
        "other": rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32),
    }
    # a faithful self-reenactment ~ interpolation of source frames
    pred = clips["src"][:2].mean(axis=0)
    assert memorization_index(pred, clips)["nearest_clip"] == "src"


def test_triptych_split_and_expected_identity_roundtrip():
    """benchmarks/memorization_check.py panel math: a triptych built
    from clip frames must yield the right expected identity from its
    source panel and flag a prediction panel taken from another clip."""
    import sys

    sys.path.insert(0, "benchmarks")
    from memorization_check import split_triptych

    rng = np.random.default_rng(0)
    clips = {
        "a": rng.random((3, 16, 16, 3), dtype=np.float32),
        "b": rng.random((3, 16, 16, 3), dtype=np.float32),
    }
    src, drv = clips["a"][0], clips["a"][1]
    leaked_pred = clips["b"][2]  # wrong-clip content
    trip = np.concatenate([src, drv, leaked_pred], axis=1)
    s, d, p = split_triptych(trip)
    assert s.shape == d.shape == p.shape == (16, 16, 3)
    np.testing.assert_array_equal(s, src)
    np.testing.assert_array_equal(p, leaked_pred)
    expected = memorization_index(s, clips)["nearest_clip"]
    got = memorization_index(p, clips)["nearest_clip"]
    assert expected == "a" and got == "b"  # leak flagged
