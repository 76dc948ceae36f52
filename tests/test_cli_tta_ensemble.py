"""CLI-level e2e for the TTA and ensemble paths (VERDICT r3 #7): synthetic
raw nuScenes -> converter -> ``tools/test.py --tta`` (batched double-flip
fusion) -> ``tools/ensemble.py`` over two member pkls. Exercises the real
entry points in subprocesses, the way a user runs them.

Slow (one tiny-config eval compile, shared via the persistent compile
cache); marked so ``-m 'not slow'`` can skip it.
"""

import os
import pickle
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _run(cmd, **kw):
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, **kw
    )
    assert proc.returncode == 0, f"{cmd}\nSTDOUT:{proc.stdout[-3000:]}\nSTDERR:{proc.stderr[-3000:]}"
    return proc


def test_tta_and_ensemble_cli(tmp_path):
    root = str(tmp_path / "nusc")
    _run([sys.executable, "tools/create_data.py", "synthetic", "--root", root,
          "--num-samples", "2"])
    infos = os.path.join(root, "nuscenes_infos_mini_train.pkl")
    assert os.path.exists(infos)

    dets_tta = str(tmp_path / "dets_tta.pkl")
    _run([sys.executable, "tools/test.py", "tiny", "--infos", infos,
          "--num-workers", "0", "--tta", "--out", dets_tta])
    with open(dets_tta, "rb") as f:
        d = pickle.load(f)
    assert len(d["tokens"]) == 2, d["tokens"]
    assert len(d["frames"]) == 2

    # second "member": the plain (non-TTA) run over the same split
    dets_plain = str(tmp_path / "dets.pkl")
    _run([sys.executable, "tools/test.py", "tiny", "--infos", infos,
          "--num-workers", "0", "--out", dets_plain])

    fused = str(tmp_path / "fused.pkl")
    proc = _run([sys.executable, "tools/ensemble.py", dets_tta, dets_plain,
                 "--infos", infos, "--out", fused])
    assert os.path.exists(fused)
    with open(fused, "rb") as f:
        merged = pickle.load(f)
    assert len(merged["tokens"]) == 2
    # metrics JSON printed by the ensemble CLI
    assert '"mAP"' in proc.stdout or "mAP" in proc.stdout
