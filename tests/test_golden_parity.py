"""Golden per-layer parity: our linen modules vs torch re-derivations of the
reference layers, with IDENTICAL weights (ours copied into torch via the
inverse of utils/torch_convert). Pins the numerics needed to load trained
reference checkpoints (SURVEY.md section 4, BASELINE 'per-layer parity').
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from megaportraits_tpu.core.dtypes import FP32_POLICY
from megaportraits_tpu.nn.blocks import (
    AdaptiveGroupNorm,
    ResBlock3D,
    ResBlockCustom,
    SPADE,
)
from megaportraits_tpu.nn.layers import WSConv, GroupNorm32, InstanceNorm
from megaportraits_tpu.models.discriminator import Discriminator

RNG = np.random.default_rng(7)
KEY = jax.random.PRNGKey(0)


def to_torch_conv(kernel, bias=None):
    """HWIO/DHWIO jax kernel -> torch OIHW/OIDHW conv params."""
    k = np.asarray(kernel)
    if k.ndim == 4:
        w = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    else:
        w = torch.from_numpy(np.transpose(k, (4, 3, 0, 1, 2)).copy())
    b = torch.from_numpy(np.asarray(bias).copy()) if bias is not None else None
    return w, b


def test_wsconv2d_matches_reference_math():
    x = RNG.standard_normal((2, 9, 9, 8)).astype(np.float32)
    module = WSConv(16, (3, 3), padding=1, policy=FP32_POLICY)
    variables = module.init(KEY, jnp.asarray(x))
    got = module.apply(variables, jnp.asarray(x))

    w, b = to_torch_conv(variables["params"]["kernel"],
                         variables["params"]["bias"])
    # Reference Conv2d_WS math (model.py:61-69).
    weight = w
    mean = weight.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True).mean(
        dim=3, keepdim=True)
    weight = weight - mean
    std = weight.view(weight.size(0), -1).std(dim=1).view(-1, 1, 1, 1) + 1e-5
    weight = weight / std.expand_as(weight)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.conv2d(xt, weight, b, padding=1).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_wsconv3d_matches_reference_math():
    x = RNG.standard_normal((1, 4, 6, 6, 4)).astype(np.float32)
    module = WSConv(8, (3, 3, 3), padding=1, policy=FP32_POLICY)
    variables = module.init(KEY, jnp.asarray(x))
    got = module.apply(variables, jnp.asarray(x))

    w, b = to_torch_conv(variables["params"]["kernel"],
                         variables["params"]["bias"])
    weight = w
    mean = (weight.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True)
            .mean(dim=3, keepdim=True).mean(dim=4, keepdim=True))
    weight = weight - mean
    std = weight.view(weight.size(0), -1).std(dim=1).view(-1, 1, 1, 1, 1) + 1e-5
    weight = weight / std.expand_as(weight)
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ref = F.conv3d(xt, weight, b, padding=1).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_group_norm32_matches_torch():
    x = RNG.standard_normal((2, 5, 5, 64)).astype(np.float32)
    got = GroupNorm32()(jnp.asarray(x))
    ref = F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), num_groups=32
                       ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_instance_norm_matches_torch():
    x = RNG.standard_normal((2, 6, 6, 8)).astype(np.float32)
    got = InstanceNorm()(jnp.asarray(x))
    ref = F.instance_norm(torch.from_numpy(x).permute(0, 3, 1, 2)
                          ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_adaptive_group_norm_matches_reference_math():
    x = RNG.standard_normal((1, 3, 5, 5, 64)).astype(np.float32)
    module = AdaptiveGroupNorm(policy=FP32_POLICY)
    variables = module.init(KEY, jnp.asarray(x))
    params = variables["params"]
    got = module.apply(variables, jnp.asarray(x))

    # Reference AdaptiveGroupNorm (model.py:304-316): GN(affine) then extra
    # learned scale/bias.
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    gn = F.group_norm(
        xt, 32,
        torch.from_numpy(np.asarray(params["group_norm"]["scale"])),
        torch.from_numpy(np.asarray(params["group_norm"]["bias"])),
    )
    w = torch.from_numpy(np.asarray(params["weight"])).view(1, -1, 1, 1, 1)
    b = torch.from_numpy(np.asarray(params["bias"])).view(1, -1, 1, 1, 1)
    ref = (gn * w + b).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_resblock_custom_2d_matches_reference_math():
    x = RNG.standard_normal((1, 8, 8, 64)).astype(np.float32)
    module = ResBlockCustom(dims=2, out_channels=96, policy=FP32_POLICY)
    variables = module.init(KEY, jnp.asarray(x))
    p = variables["params"]
    got = module.apply(variables, jnp.asarray(x))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    w_res, b_res = to_torch_conv(p["conv_res"]["Conv_0"]["kernel"],
                                 p["conv_res"]["Conv_0"]["bias"])
    out2 = F.conv2d(xt, w_res, b_res, padding=1)

    out1 = F.relu(F.group_norm(xt, 32))
    w_ws, b_ws = to_torch_conv(p["conv_ws"]["kernel"], p["conv_ws"]["bias"])
    mean = w_ws.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True).mean(
        dim=3, keepdim=True)
    w_std = w_ws - mean
    std = w_std.view(w_std.size(0), -1).std(dim=1).view(-1, 1, 1, 1) + 1e-5
    out1 = F.conv2d(out1, w_std / std.expand_as(w_std), b_ws, padding=1)
    out1 = F.relu(F.group_norm(out1, 32))
    w_c, b_c = to_torch_conv(p["conv"]["Conv_0"]["kernel"],
                             p["conv"]["Conv_0"]["bias"])
    out1 = F.conv2d(out1, w_c, b_c, padding=1)
    ref = (out1 + out2).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-5)


def test_discriminator_matches_reference_math():
    a = RNG.random((1, 32, 32, 3)).astype(np.float32)
    b = RNG.random((1, 32, 32, 3)).astype(np.float32)
    module = Discriminator(policy=FP32_POLICY)
    variables = module.init(KEY, jnp.asarray(a), jnp.asarray(b))
    p = variables["params"]
    got = module.apply(variables, jnp.asarray(a), jnp.asarray(b))

    # Reference PatchGAN (model.py:1902-1926).
    x = torch.cat([torch.from_numpy(a).permute(0, 3, 1, 2),
                   torch.from_numpy(b).permute(0, 3, 1, 2)], dim=1)
    for i in range(4):
        w, bias = to_torch_conv(p[f"block{i}_conv"]["Conv_0"]["kernel"],
                                p[f"block{i}_conv"]["Conv_0"]["bias"])
        x = F.conv2d(x, w, bias, stride=2, padding=1)
        if i > 0:
            x = F.instance_norm(x)
        x = F.leaky_relu(x, 0.2)
    x = F.pad(x, (1, 0, 1, 0))
    w, _ = to_torch_conv(p["final_conv"]["Conv_0"]["kernel"])
    x = F.conv2d(x, w, None, padding=1)
    ref = x.permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-5)


def test_spade_matches_reference_math_fixed():
    """SPADE with the documented defect fixes: conv_shared takes C channels,
    gamma/beta offsets are applied per-channel (model.py:1503-1533)."""
    x = RNG.standard_normal((2, 6, 6, 16)).astype(np.float32)
    idx = np.array([0, 1], dtype=np.int32)
    module = SPADE(num_avatars=3, policy=FP32_POLICY)
    variables = module.init(KEY, jnp.asarray(x), jnp.asarray(idx))
    p = variables["params"]
    got = module.apply(variables, jnp.asarray(x), jnp.asarray(idx))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    normed = F.instance_norm(xt)
    w_s, b_s = to_torch_conv(p["conv_shared"]["Conv_0"]["kernel"],
                             p["conv_shared"]["Conv_0"]["bias"])
    shared = F.relu(F.conv2d(normed, w_s, b_s, padding=1))
    emb_shared = torch.from_numpy(
        np.asarray(p["avatar_shared_emb"]["embedding"])[idx])
    shared = shared + emb_shared.view(-1, 128, 1, 1)
    w_g, b_g = to_torch_conv(p["conv_gamma"]["Conv_0"]["kernel"],
                             p["conv_gamma"]["Conv_0"]["bias"])
    w_b, b_b = to_torch_conv(p["conv_beta"]["Conv_0"]["kernel"],
                             p["conv_beta"]["Conv_0"]["bias"])
    gamma = F.conv2d(shared, w_g, b_g, padding=1)
    beta = F.conv2d(shared, w_b, b_b, padding=1)
    gamma = gamma + torch.from_numpy(
        np.asarray(p["avatar_gamma_emb"]["embedding"])[idx]).view(-1, 16, 1, 1)
    beta = beta + torch.from_numpy(
        np.asarray(p["avatar_beta_emb"]["embedding"])[idx]).view(-1, 16, 1, 1)
    ref = (normed * (1 + gamma) + beta).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-5)
