"""Native C++ point loader vs the numpy path."""

import numpy as np
import pytest

from deepinteraction_tpu.data import native


@pytest.fixture(scope="module")
def clouds(tmp_path_factory):
    root = tmp_path_factory.mktemp("clouds")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(3):
        pts = rng.uniform(-20, 20, size=(100 + 10 * i, 5)).astype(np.float32)
        p = str(root / f"c{i}.bin")
        pts.tofile(p)
        paths.append(p)
        arrays.append(pts)
    return paths, arrays


def test_native_matches_numpy(clouds):
    if not native.available():
        pytest.skip("g++ unavailable")
    paths, arrays = clouds
    rots = np.stack([np.eye(3) for _ in paths])
    rots[1] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]])  # 90deg yaw
    trans = np.stack([np.zeros(3), np.array([1.0, 2.0, 0.5]), np.zeros(3)])
    ts = np.array([0.0, 0.05, 0.1])
    pcr = (-1e9, -1e9, -1e9, 1e9, 1e9, 1e9)

    out, mask, n = native.assemble_points(paths, rots, trans, ts, pcr, 1024)
    assert n == sum(a.shape[0] for a in arrays)
    assert mask.sum() == n

    expected = []
    for i, a in enumerate(arrays):
        e = a.copy()
        e[:, :3] = e[:, :3] @ rots[i].T.astype(np.float32) + trans[i].astype(np.float32)
        e[:, 4] = ts[i]
        if i == 0:
            e[:, :3] = a[:, :3]  # key frame untouched
            e[:, 4] = 0.0
        expected.append(e)
    expected = np.concatenate(expected)
    np.testing.assert_allclose(out[:n], expected, rtol=1e-6, atol=1e-5)
    assert (out[n:] == 0).all()


def test_native_range_filter_and_shuffle(clouds):
    if not native.available():
        pytest.skip("g++ unavailable")
    paths, arrays = clouds
    rots = np.stack([np.eye(3) for _ in paths])
    trans = np.zeros((3, 3))
    ts = np.zeros(3)
    pcr = (-5.0, -5.0, -5.0, 5.0, 5.0, 5.0)
    out, mask, n = native.assemble_points(
        paths, rots, trans, ts, pcr, 1024, shuffle=True, seed=7
    )
    allpts = np.concatenate(arrays)
    inside = (
        (allpts[:, 0] >= -5) & (allpts[:, 0] <= 5)
        & (allpts[:, 1] >= -5) & (allpts[:, 1] <= 5)
        & (allpts[:, 2] >= -5) & (allpts[:, 2] <= 5)
    )
    assert n == int(inside.sum())
    # shuffled but same multiset of x coords
    np.testing.assert_allclose(
        np.sort(out[:n, 0]), np.sort(allpts[inside][:, 0]), atol=1e-6
    )


def test_pipeline_uses_native(clouds, monkeypatch):
    """load_sweep_points produces identical output with/without native."""
    if not native.available():
        pytest.skip("g++ unavailable")
    from deepinteraction_tpu.data import pipeline

    paths, arrays = clouds
    info = {
        "lidar_path": paths[0],
        "timestamp": 2_000_000,
        "sweeps": [
            {
                "data_path": paths[1],
                "timestamp": 1_950_000,
                "sensor2lidar_rotation": np.eye(3),
                "sensor2lidar_translation": np.array([1.0, 0.0, 0.0]),
            }
        ],
    }
    monkeypatch.setattr(pipeline, "USE_NATIVE_IO", True)
    a = pipeline.load_sweep_points(info, 10, None)
    monkeypatch.setattr(pipeline, "USE_NATIVE_IO", False)
    b = pipeline.load_sweep_points(info, 10, None)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5)
