import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.ops.depth_fill import fill_in_multiscale
from deepinteraction_tpu.ops.hungarian import hungarian_assign


def _load_reference_ip_basic():
    """Import the reference OpenCV implementation as a test oracle."""
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 not available for oracle")
    # legacy numpy alias used by the old reference code
    if not hasattr(np, "bool"):
        np.bool = bool  # type: ignore[attr-defined]
    path = (
        "/root/reference/projects/mmdet3d_plugin/models/utils/ip_basic/"
        "depth_map_utils.py"
    )
    spec = importlib.util.spec_from_file_location("ref_depth_map_utils", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_depth_map_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_depth_fill_matches_reference_cv2():
    ref = _load_reference_ip_basic()
    rng = np.random.default_rng(0)
    h, w = 48, 64
    depth = np.zeros((h, w), np.float32)
    # sparse depths in all three bins
    n = 150
    ys = rng.integers(8, h, n)
    xs = rng.integers(0, w, n)
    vals = rng.uniform(2.0, 70.0, n).astype(np.float32)
    depth[ys, xs] = vals

    expect, _ = ref.fill_in_multiscale(
        depth.copy(), extrapolate=False, blur_type="bilateral", show_process=False
    )
    got = np.asarray(fill_in_multiscale(jnp.asarray(depth)))
    # identical stage structure; tolerance covers float associativity and
    # cv2's fixed-point median internals
    mism = np.abs(got - expect) > 0.05
    assert mism.mean() < 0.02, f"{mism.mean():.4f} of pixels differ"


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(1)
    cost = rng.normal(size=(6, 5)).astype(np.float32)
    out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(5)))
    rows, cols = linear_sum_assignment(cost)
    expect = np.full(6, -1, np.int32)
    expect[rows] = cols
    np.testing.assert_array_equal(out, expect)


def test_hungarian_batched_and_padded():
    rng = np.random.default_rng(2)
    cost = rng.normal(size=(2, 3, 8, 4)).astype(np.float32)
    num_gt = np.array([[2, 0, 4], [1, 3, 4]], np.int32)
    out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(num_gt)))
    assert out.shape == (2, 3, 8)
    from scipy.optimize import linear_sum_assignment

    for i in range(2):
        for j in range(3):
            ng = num_gt[i, j]
            expect = np.full(8, -1, np.int32)
            if ng > 0:
                r, c = linear_sum_assignment(cost[i, j][:, :ng])
                expect[r] = c
            np.testing.assert_array_equal(out[i, j], expect)


def test_depth_fill_lite_structure():
    """lite=True keeps the fill's structure (valid pixels stay valid, holes
    above the first return stay empty, values near-identical where both
    fill) while skipping the final smoothing passes."""
    rng = np.random.default_rng(0)
    d = np.zeros((2, 24, 32), np.float32)
    ys = rng.integers(4, 24, size=(2, 60))
    xs = rng.integers(0, 32, size=(2, 60))
    for b in range(2):
        d[b, ys[b], xs[b]] = rng.uniform(2.0, 80.0, 60).astype(np.float32)
    exact = np.asarray(fill_in_multiscale(jnp.asarray(d)))
    lite = np.asarray(fill_in_multiscale(jnp.asarray(d), lite=True))
    # default is the exact path
    assert np.array_equal(
        exact, np.asarray(fill_in_multiscale(jnp.asarray(d)))
    )
    # every exact-filled pixel that lite also fills agrees to the
    # smoothing tolerance; lite may fill slightly fewer hole pixels
    both = (exact > 0.1) & (lite > 0.1)
    assert both.mean() > 0.5
    diff = np.abs(exact[both] - lite[both])
    assert np.median(diff) < 2.0
    # lite never invents depth where the exact fill has none
    assert ((lite > 0.1) & ~(exact > 0.1)).mean() < 0.05
