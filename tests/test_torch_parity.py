"""Module-level golden parity against torch (CPU).

The released reference checkpoints aren't available in this environment, so
activation parity is established at the module level: weights generated in
torch, converted with utils/torch_convert layout rules, outputs compared.
This validates both the module math (TorchMHA vs nn.MultiheadAttention,
convs vs torch convs) and the converter's layout adaptation in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_mha_parity_packed_inproj():
    """TorchMHA == torch.nn.MultiheadAttention with converted packed
    in_proj weights (decoder_utils.py MultiheadAttention semantics)."""
    from deepinteraction_tpu.models.layers import TorchMHA

    c, h, b, l, s = 32, 4, 2, 5, 7
    tm = torch.nn.MultiheadAttention(c, h, dropout=0.0, batch_first=True)
    tm.eval()
    rng = np.random.default_rng(0)
    q = rng.normal(size=(b, l, c)).astype(np.float32)
    k = rng.normal(size=(b, s, c)).astype(np.float32)
    v = rng.normal(size=(b, s, c)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tm(torch.tensor(q), torch.tensor(k), torch.tensor(v))

    ipw = tm.in_proj_weight.detach().numpy()
    ipb = tm.in_proj_bias.detach().numpy()
    params = {
        "q_proj": {"kernel": ipw[:c].T, "bias": ipb[:c]},
        "k_proj": {"kernel": ipw[c : 2 * c].T, "bias": ipb[c : 2 * c]},
        "v_proj": {"kernel": ipw[2 * c :].T, "bias": ipb[2 * c :]},
        "out_proj": {
            "kernel": tm.out_proj.weight.detach().numpy().T,
            "bias": tm.out_proj.bias.detach().numpy(),
        },
    }
    m = TorchMHA(c, h, 0.0)
    out = m.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(v),
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5, rtol=2e-5)


def test_conv_bn_parity():
    """flax Conv+BN with converted torch weights == torch Conv2d+BN2d."""
    from deepinteraction_tpu.models.layers import ConvBNReLU

    tconv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    tbn = torch.nn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.normal_()
        tbn.bias.normal_()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 10, 12)).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(tbn(tconv(torch.tensor(x)))).numpy()

    variables = {
        "params": {
            "conv": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))},
            "bn": {
                "scale": jnp.asarray(tbn.weight.detach().numpy()),
                "bias": jnp.asarray(tbn.bias.detach().numpy()),
            },
        },
        "batch_stats": {
            "bn": {
                "mean": jnp.asarray(tbn.running_mean.numpy()),
                "var": jnp.asarray(tbn.running_var.numpy()),
            }
        },
    }
    m = ConvBNReLU(8, 3)
    out = m.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5, rtol=2e-5
    )


def test_deconv_parity_secondfpn():
    """flax ConvTranspose == torch ConvTranspose2d (SECONDFPN deblocks)."""
    from flax import linen as nn

    tdeconv = torch.nn.ConvTranspose2d(4, 6, 2, stride=2, bias=False)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = tdeconv(torch.tensor(x)).numpy()

    # torch deconv weight [In, Out, kh, kw] -> flax transpose_kernel layout
    # [kh, kw, Out, In]
    kernel = tdeconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    m = nn.ConvTranspose(6, (2, 2), strides=(2, 2), use_bias=False, transpose_kernel=True)
    out = m.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5, rtol=2e-5
    )


def test_gaussian_focal_loss_parity():
    """Our gaussian focal == mmdet's formula evaluated in torch."""
    from deepinteraction_tpu.targets.losses import gaussian_focal_loss

    rng = np.random.default_rng(3)
    pred = rng.uniform(0.01, 0.99, size=(2, 8, 8, 3)).astype(np.float32)
    target = np.zeros_like(pred)
    target[0, 2, 2, 1] = 1.0
    target[1, 5, 5, 0] = 1.0
    target[0, 2, 3, 1] = 0.6

    tp, tt = torch.tensor(pred), torch.tensor(target)
    eps = 1e-12
    pos_w = tt.eq(1)
    neg_w = (1 - tt).pow(4)
    pos_loss = -(tp + eps).log() * (1 - tp).pow(2) * pos_w
    neg_loss = -(1 - tp + eps).log() * tp.pow(2) * neg_w * (~pos_w)
    ref = (pos_loss.sum() + neg_loss.sum()).item() / 2.0  # avg_factor = 2 centers

    out = gaussian_focal_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(2.0))
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)
