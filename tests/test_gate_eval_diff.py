"""Detection-level perturbation diff of tools/gate_eval.py (round 5).

mAP deltas on a short-trained gate checkpoint lack resolving power; the
diff mode instead matches each parity top-k box to the nearest deviation
box and reports score/center deltas — checkpoint-quality-independent.
These tests pin the matching/statistics logic with hand-built frames.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gate_eval import diff_dets  # noqa: E402

from deepinteraction_tpu.eval.nuscenes_metrics import DetectionFrame  # noqa: E402


def _frame(centers, scores, names):
    n = len(scores)
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, :3] = np.asarray(centers, dtype=np.float32)
    boxes[:, 3:6] = 1.0
    return DetectionFrame(
        boxes=boxes,
        velocity=np.zeros((n, 2), np.float32),
        names=np.asarray(names),
        scores=np.asarray(scores, np.float32),
    )


def _dump(path, frames):
    with open(path, "wb") as f:
        pickle.dump({"tokens": [f"t{i}" for i in range(len(frames))], "frames": frames}, f)


def test_identical_runs_have_zero_deltas(tmp_path):
    fr = _frame([[0, 0, 0], [5, 0, 0]], [0.9, 0.5], ["car", "truck"])
    _dump(tmp_path / "a.pkl", [fr])
    _dump(tmp_path / "b.pkl", [fr])
    s = diff_dets(str(tmp_path / "a.pkl"), str(tmp_path / "b.pkl"))
    assert s["pairs"] == 2
    assert s["score_max"] == 0.0
    assert s["center_m_max"] == 0.0
    assert s["label_match"] == 1.0


def test_perturbation_is_measured(tmp_path):
    pa = _frame([[0, 0, 0], [5, 0, 0]], [0.9, 0.5], ["car", "truck"])
    # deviation run: boxes listed in the other order (matching must pair by
    # distance, not index), 0.1 m / 0.02 score perturbation on the car
    gb = _frame([[5, 0, 0], [0.1, 0, 0]], [0.5, 0.88], ["truck", "car"])
    _dump(tmp_path / "a.pkl", [pa])
    _dump(tmp_path / "b.pkl", [gb])
    s = diff_dets(str(tmp_path / "a.pkl"), str(tmp_path / "b.pkl"))
    assert s["pairs"] == 2
    assert s["score_max"] == pytest.approx(0.02, abs=1e-6)
    assert s["center_m_max"] == pytest.approx(0.1, abs=1e-6)
    assert s["label_match"] == 1.0


def test_label_flip_detected_and_greedy_no_reuse(tmp_path):
    pa = _frame([[0, 0, 0], [0.2, 0, 0]], [0.9, 0.8], ["car", "car"])
    # one deviation box sits between both parity boxes; greedy matching must
    # consume it once, pairing the second parity box with the far box
    gb = _frame([[0.05, 0, 0], [10, 0, 0]], [0.9, 0.1], ["car", "bus"])
    _dump(tmp_path / "a.pkl", [pa])
    _dump(tmp_path / "b.pkl", [gb])
    s = diff_dets(str(tmp_path / "a.pkl"), str(tmp_path / "b.pkl"))
    assert s["pairs"] == 2
    assert s["label_match"] == 0.5
    assert s["center_m_max"] == pytest.approx(9.8, abs=1e-6)


def test_token_order_mismatch_raises(tmp_path):
    fr = _frame([[0, 0, 0]], [0.9], ["car"])
    _dump(tmp_path / "a.pkl", [fr])
    with open(tmp_path / "b.pkl", "wb") as f:
        pickle.dump({"tokens": ["other"], "frames": [fr]}, f)
    with pytest.raises(AssertionError, match="sample order"):
        diff_dets(str(tmp_path / "a.pkl"), str(tmp_path / "b.pkl"))
