import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.ops.gaussian import draw_heatmap, gaussian_radius
from deepinteraction_tpu.ops.roi_align import roi_align
from deepinteraction_tpu.ops.rotated_iou import iou_3d, iou_bev
from deepinteraction_tpu.ops.nms import circle_nms, rotated_nms


def _np_roi_align(feat, box, p=2, s=2, scale=1.0):
    """Independent ROIAlignV2 oracle (aligned=True)."""
    h, w, c = feat.shape

    def bil(y, x):
        if y <= -1.0 or y >= h or x <= -1.0 or x >= w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx
        )

    x0, y0, x1, y1 = box
    x0, y0, x1, y1 = x0 * scale - 0.5, y0 * scale - 0.5, x1 * scale - 0.5, y1 * scale - 0.5
    bw, bh = (x1 - x0) / p, (y1 - y0) / p
    out = np.zeros((p, p, c))
    for i in range(p):
        for j in range(p):
            acc = np.zeros(c)
            for si in range(s):
                for sj in range(s):
                    yy = y0 + (i + (si + 0.5) / s) * bh
                    xx = x0 + (j + (sj + 0.5) / s) * bw
                    acc += bil(yy, xx)
            out[i, j] = acc / (s * s)
    return out


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(10, 12, 3)).astype(np.float32)
    boxes = np.array(
        [[1.0, 2.0, 7.5, 9.0], [-2.0, -1.0, 5.0, 4.0], [8.0, 6.0, 14.0, 12.0]],
        np.float32,
    )
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), output_size=2, spatial_scale=0.5)
    )
    for i, b in enumerate(boxes):
        expect = _np_roi_align(feat, b, p=2, s=2, scale=0.5)
        np.testing.assert_allclose(got[i], expect, rtol=1e-4, atol=1e-5)


def test_iou_identical_and_disjoint():
    boxes = np.array(
        [[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, 0.3], [10.0, 10.0, 0.0, 2.0, 4.0, 1.0, 1.0]],
        np.float32,
    )
    iou = np.asarray(iou_3d(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-5)
    assert iou[0, 1] == 0.0


def test_iou_axis_aligned_overlap():
    a = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    b = np.array([[1.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    # bev inter = 1x2=2, z overlap 2 -> inter 4; union = 8+8-4 = 12
    iou = np.asarray(iou_3d(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou, [[4.0 / 12.0]], atol=1e-5)


def test_iou_rotated_45_square():
    # unit square vs same square rotated 45 deg: intersection is a regular
    # octagon with area 2*(sqrt(2)-1)
    a = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]], np.float32)
    b = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, np.pi / 4]], np.float32)
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    iou = np.asarray(iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou, [[expect]], rtol=1e-4)


def test_gaussian_radius_and_heatmap():
    r = float(gaussian_radius((10.0, 6.0), 0.1))
    # radius must produce IoU >= min_overlap for the shifted box in each case
    assert 0 < r < 10
    hm = np.asarray(
        draw_heatmap(
            jnp.asarray([[4.0, 5.0], [0.0, 0.0]]),
            jnp.asarray([2, 2]),
            jnp.asarray([1, 0]),
            jnp.asarray([True, False]),
            num_classes=3,
            height=12,
            width=10,
        )
    )
    assert hm.shape == (3, 12, 10)
    assert hm[1, 5, 4] == 1.0  # peak at integer center
    sigma = (2 * 2 + 1) / 6.0
    np.testing.assert_allclose(hm[1, 5, 5], np.exp(-1 / (2 * sigma**2)), rtol=1e-5)
    assert hm[1, 5, 7] == 0.0  # outside radius patch
    assert hm[0].max() == 0.0  # masked box drawn nowhere
    assert hm[2].max() == 0.0


def test_circle_nms():
    centers = jnp.asarray([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(
        circle_nms(centers, scores, jnp.ones(3, bool), radius=0.175)
    )
    np.testing.assert_array_equal(keep, [True, False, True])


def test_rotated_nms():
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0],
            [0.5, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0],
            [6.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0],
        ]
    )
    scores = jnp.asarray([0.5, 0.9, 0.1])
    keep = np.asarray(rotated_nms(boxes, scores, jnp.ones(3, bool), 0.3))
    np.testing.assert_array_equal(keep, [False, True, True])


def test_iou_bev_matches_rasterization_oracle():
    """Randomized rotated boxes vs a dense point-in-rectangle rasterization
    — an oracle independent of the polygon-clipping implementation."""
    from deepinteraction_tpu.ops.rotated_iou import iou_bev

    rng = np.random.default_rng(2)
    n = 12
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-3, 3, (n, 2))
    boxes[:, 3:5] = rng.uniform(0.8, 4.0, (n, 2))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)

    def inside(px, py, b):
        dx, dy = px - b[0], py - b[1]
        c, s = np.cos(b[6]), np.sin(b[6])
        lx = c * dx + s * dy
        ly = -s * dx + c * dy
        return (np.abs(lx) <= b[3] / 2) & (np.abs(ly) <= b[4] / 2)

    got = np.asarray(iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(n):
        for j in range(i, n):
            a, b = boxes[i], boxes[j]
            lo = np.minimum(a[:2], b[:2]) - max(a[3] + a[4], b[3] + b[4])
            hi = np.maximum(a[:2], b[:2]) + max(a[3] + a[4], b[3] + b[4])
            xs = np.linspace(lo[0], hi[0], 480)
            ys = np.linspace(lo[1], hi[1], 480)
            cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
            gx, gy = np.meshgrid(xs, ys)
            ina, inb = inside(gx, gy, a), inside(gx, gy, b)
            inter = (ina & inb).sum() * cell
            union = (ina | inb).sum() * cell
            ref = inter / max(union, 1e-8)
            assert abs(got[i, j] - ref) < 2e-2, (i, j, got[i, j], ref)
