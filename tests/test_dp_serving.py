"""8-way data-parallel *serving* (batch-sharded inference) on the virtual
CPU mesh (VERDICT r2 next-round #9).

The claim "per-chip fps is unchanged under N-way DP serving" rests on two
facts this test proves structurally rather than extrapolates:

1. the eval forward + box decode contains ZERO collectives — each device
   runs an independent per-example program (asserted on the compiled SPMD
   module text), so adding devices cannot change per-device work;
2. sharding the batch over the mesh computes exactly what the single-device
   program computes (asserted numerically per example).

Reference counterpart: ``tools/dist_test.sh`` / ``tools/test.py`` DDP eval
(one model replica per GPU, disjoint sample shards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deepinteraction_tpu.configs import dryrun_config
from deepinteraction_tpu.inference import get_bboxes
from deepinteraction_tpu.models.detector import DeepInteraction
from deepinteraction_tpu.parallel.mesh import make_mesh
from deepinteraction_tpu.utils.testing import fast_init_variables, make_synthetic_batch

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute", "all-to-all")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_sharded_inference_matches_single_device():
    n = 8
    cfg = dryrun_config()
    model = DeepInteraction(
        cfg.model, cfg.data.padded_img_shape, num_proposals=cfg.test_num_proposals
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(cfg, b=n, seed=3).items()
    }
    variables = fast_init_variables(model, batch)
    dcfg = cfg.model.pts_bbox_head

    def forward(variables, batch):
        preds = model.apply(variables, batch, False)
        return get_bboxes(preds, dcfg, cfg.model.bbox_coder, cfg.test_num_proposals)

    # single-device reference result
    ref = jax.jit(forward)(variables, batch)

    mesh = make_mesh(data=n, model=1)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    variables_r = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), variables
    )
    batch_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, data_sh), batch)

    jitted = jax.jit(
        forward,
        in_shardings=(
            jax.tree_util.tree_map(lambda _: repl, variables_r),
            jax.tree_util.tree_map(lambda _: data_sh, batch_s),
        ),
    )
    compiled = jitted.lower(variables_r, batch_s).compile()

    # structural half of the per-chip-fps-unchanged claim: no cross-device
    # communication anywhere in the serving program
    hlo = compiled.as_text()
    present = [c for c in COLLECTIVES if c in hlo]
    assert not present, f"DP serving graph contains collectives: {present}"

    out = compiled(variables_r, batch_s)
    for r, o in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(o), rtol=1e-5, atol=1e-5
        )
