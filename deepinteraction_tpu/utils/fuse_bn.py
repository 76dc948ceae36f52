"""Inference-time Conv+BN folding (reference tools/misc/fuse_conv_bn.py).

Walks the variables tree; wherever a module holds a conv kernel and a
sibling BatchNorm ({scale, bias} + batch_stats {mean, var}), the BN affine
is folded into the kernel/bias and the BN neutralized (scale=1, bias=0,
mean=0, var=1) so the jitted graph's BN becomes the identity.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

BN_EPS_DEFAULT = 1e-5


def _fold(kernel, conv_bias, scale, bias, mean, var, eps):
    std = np.sqrt(np.asarray(var) + eps)
    factor = np.asarray(scale) / std  # [Cout]
    new_kernel = np.asarray(kernel) * factor  # kernel [..., Cout]
    cb = 0.0 if conv_bias is None else np.asarray(conv_bias)
    new_bias = (cb - np.asarray(mean)) * factor + np.asarray(bias)
    return new_kernel, new_bias


def fuse_conv_bn(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    eps: float = BN_EPS_DEFAULT,
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Returns (params, batch_stats, num_fused). Folds the conv+bn pairs
    laid out as {'conv': {...}, 'bn': {...}} (our ConvBNReLU and friends)."""
    import copy

    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    count = 0

    def walk(p_node, s_node):
        nonlocal count
        if not isinstance(p_node, dict):
            return
        keys = list(p_node.keys())
        for k in keys:
            child = p_node[k]
            if not isinstance(child, dict):
                continue
            # pattern: sibling 'conv' + 'bn' under the same parent
            if (
                k == "bn"
                and "conv" in p_node
                and isinstance(s_node, dict)
                and "bn" in s_node
                and "kernel" in p_node["conv"]
            ):
                kern = p_node["conv"]["kernel"]
                cb = p_node["conv"].get("bias")
                nk, nb = _fold(
                    kern,
                    cb,
                    child["scale"],
                    child["bias"],
                    s_node["bn"]["mean"],
                    s_node["bn"]["var"],
                    eps,
                )
                dt = np.asarray(kern).dtype
                p_node["conv"]["kernel"] = nk.astype(dt)
                # the conv may be bias-free (bias='auto' with norm); carry
                # the folded bias in the neutralized BN's affine instead
                child["scale"] = np.ones_like(np.asarray(child["scale"]))
                child["bias"] = nb.astype(dt)
                if cb is not None:
                    p_node["conv"]["bias"] = np.zeros_like(np.asarray(cb))
                s_node["bn"]["mean"] = np.zeros_like(np.asarray(s_node["bn"]["mean"]))
                # var = 1 - eps so rsqrt(var + eps) == 1 exactly
                s_node["bn"]["var"] = np.full_like(
                    np.asarray(s_node["bn"]["var"]), 1.0 - eps
                )
                count += 1
            else:
                walk(child, s_node.get(k, {}) if isinstance(s_node, dict) else {})

    walk(params, batch_stats)
    return params, batch_stats, count
