"""Frozen-seed full-graph golden regression (VERDICT round-1 weak #3).

Shape/finiteness e2e tests can't catch wiring bugs (swapped view order, a
block fed the wrong feature). These tests run the full v1 and ++ graphs
with frozen seeds and compare a numeric digest of every output head against
fixtures checked into git. The digest (moments + a strided value sample) is
tolerant to sub-1e-3 numeric drift but any composition change moves it.

Regenerate intentionally with:
    DI_REGEN_GOLDEN=1 python -m pytest tests/test_golden_regression.py -q
(conftest pins CPU + highest matmul precision, so fixtures are stable.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.configs import tiny_config, tiny_pp_config
from deepinteraction_tpu.models.detector import DeepInteraction
from deepinteraction_tpu.utils.testing import make_synthetic_batch

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SAMPLE_N = 64


def _digest(preds):
    out = {}
    for k in sorted(preds):
        v = np.asarray(preds[k], np.float64).ravel()
        stride = max(len(v) // SAMPLE_N, 1)
        out[f"{k}__sample"] = v[::stride][:SAMPLE_N]
        out[f"{k}__stats"] = np.array(
            [v.mean(), v.std(), np.abs(v).mean(), v.min(), v.max()]
        )
    return out


def _run(cfg_fn, seed):
    cfg = cfg_fn()
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=1, with_gt=True, seed=seed).items()
    }
    model = DeepInteraction(cfg.model, cfg.data.padded_img_shape)
    variables = jax.jit(lambda r, b: model.init(r, b, False))(
        jax.random.PRNGKey(seed), batch
    )
    preds = jax.jit(lambda v, b: model.apply(v, b, False))(variables, batch)
    return _digest(preds)


@pytest.mark.parametrize(
    "name,cfg_fn,seed",
    [("v1", tiny_config, 7), ("pp", tiny_pp_config, 7)],
)
def test_full_graph_golden(name, cfg_fn, seed):
    got = _run(cfg_fn, seed)
    path = os.path.join(FIXTURE_DIR, f"golden_{name}.npz")
    if os.environ.get("DI_REGEN_GOLDEN"):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        np.savez(path, **got)
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"golden fixture missing; run DI_REGEN_GOLDEN=1 pytest {__file__}"
    )
    want = np.load(path)
    assert set(want.files) == set(got), (
        f"output-head set changed: {sorted(set(want.files) ^ set(got))}"
    )
    for k in want.files:
        np.testing.assert_allclose(
            got[k], want[k], rtol=2e-3, atol=5e-4, err_msg=k
        )
