"""Golden parity tests for ops/ against PyTorch CPU.

These pin the exact numerical conventions (align_corners, border padding,
reference renormalization quirk) needed for per-layer parity with trained
reference checkpoints (SURVEY.md section 4 'golden-value parity tests').
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from megaportraits_tpu.ops import (
    affine_grid_3d,
    anti_alias_downsample,
    apply_warping_field,
    avg_pool_2d,
    compute_rt_warp,
    grid_sample_3d,
    linear_resize,
    nearest_resize,
    rotation_matrix_from_euler_deg,
    upsample_nearest,
)

RNG = np.random.default_rng(0)


def assert_close(jax_out, torch_out, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(
        np.asarray(jax_out), torch_out.numpy(), atol=atol, rtol=rtol
    )


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw", [((16, 16), (37, 64)), ((64, 64), (32, 32)), ((7, 9), (14, 18))]
)
def test_bilinear_resize_matches_torch(align, in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 5), dtype=np.float32)
    got = linear_resize(jnp.asarray(x), out_hw, axes=(1, 2), align_corners=align)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=out_hw,
        mode="bilinear",
        align_corners=align,
    ).permute(0, 2, 3, 1)
    assert_close(got, ref)


@pytest.mark.parametrize("align", [True, False])
def test_trilinear_resize_matches_torch(align):
    x = RNG.standard_normal((1, 4, 12, 10, 3), dtype=np.float32)
    out_size = (16, 64, 64)
    got = linear_resize(jnp.asarray(x), out_size, axes=(1, 2, 3), align_corners=align)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        size=out_size,
        mode="trilinear",
        align_corners=align,
    ).permute(0, 2, 3, 4, 1)
    assert_close(got, ref)


def test_nearest_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 4), dtype=np.float32)
    got = nearest_resize(jnp.asarray(x), (16, 16), axes=(1, 2))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(16, 16), mode="nearest"
    ).permute(0, 2, 3, 1)
    assert_close(got, ref)
    # Non-integer factor.
    got = nearest_resize(jnp.asarray(x), (11, 13), axes=(1, 2))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(11, 13), mode="nearest"
    ).permute(0, 2, 3, 1)
    assert_close(got, ref)


def test_upsample_nearest_3d_matches_torch():
    x = RNG.standard_normal((1, 4, 3, 3, 6), dtype=np.float32)
    got = upsample_nearest(jnp.asarray(x), (2, 2, 2), axes=(1, 2, 3))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), scale_factor=2, mode="nearest"
    ).permute(0, 2, 3, 4, 1)
    assert_close(got, ref)


def test_avg_pool_matches_torch():
    x = RNG.standard_normal((2, 16, 16, 8), dtype=np.float32)
    got = avg_pool_2d(jnp.asarray(x))
    ref = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2).permute(
        0, 2, 3, 1
    )
    assert_close(got, ref)


@pytest.mark.parametrize("scale", [0.5, 0.25])
def test_anti_alias_downsample_matches_reference_math(scale):
    # Re-derive the reference AntiAliasInterpolation2d with raw torch ops.
    x = RNG.standard_normal((2, 32, 32, 3), dtype=np.float32)
    got = anti_alias_downsample(jnp.asarray(x), scale)

    sigma = (1 / scale - 1) / 2
    ksize = 2 * round(sigma * 4) + 1
    ka = ksize // 2
    kb = ka - 1 if ksize % 2 == 0 else ka
    grids = torch.meshgrid(
        [torch.arange(ksize, dtype=torch.float32)] * 2, indexing="ij"
    )
    kernel = torch.ones(())
    for size, std, mg in zip([ksize] * 2, [sigma] * 2, grids):
        mean = (size - 1) / 2
        kernel = kernel * torch.exp(-((mg - mean) ** 2) / (2 * std**2))
    kernel = kernel / kernel.sum()
    weight = kernel.view(1, 1, ksize, ksize).repeat(3, 1, 1, 1)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    out = F.pad(xt, (ka, kb, ka, kb))
    out = F.conv2d(out, weight=weight, groups=3)
    out = F.interpolate(out, scale_factor=(scale, scale))
    assert_close(got, out.permute(0, 2, 3, 1), atol=1e-4)


def test_rotation_matrix_matches_reference_math():
    angles = RNG.uniform(-90, 90, size=(4, 3)).astype(np.float32)
    got = rotation_matrix_from_euler_deg(jnp.asarray(angles))

    rot = torch.from_numpy(angles) * (torch.pi / 180.0)
    ca, cb, cg = torch.cos(rot[:, 0]), torch.cos(rot[:, 1]), torch.cos(rot[:, 2])
    sa, sb, sg = torch.sin(rot[:, 0]), torch.sin(rot[:, 1]), torch.sin(rot[:, 2])
    zero, one = torch.zeros_like(ca), torch.ones_like(ca)
    ra = torch.stack(
        [
            torch.stack([one, zero, zero], 1),
            torch.stack([zero, ca, -sa], 1),
            torch.stack([zero, sa, ca], 1),
        ],
        1,
    )
    rb = torch.stack(
        [
            torch.stack([cb, zero, sb], 1),
            torch.stack([zero, one, zero], 1),
            torch.stack([-sb, zero, cb], 1),
        ],
        1,
    )
    rg = torch.stack(
        [
            torch.stack([cg, -sg, zero], 1),
            torch.stack([sg, cg, zero], 1),
            torch.stack([zero, zero, one], 1),
        ],
        1,
    )
    ref = torch.matmul(ra, torch.matmul(rb, rg))
    assert_close(got, ref, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
def test_affine_grid_matches_torch(align):
    theta = RNG.standard_normal((2, 3, 4), dtype=np.float32) * 0.3
    theta[:, :, :3] += np.eye(3)
    size = (4, 6, 5)
    got = affine_grid_3d(jnp.asarray(theta), size, align_corners=align)
    ref = F.affine_grid(
        torch.from_numpy(theta), (2, 1, *size), align_corners=align
    )
    assert_close(got, ref, atol=1e-5)


def test_compute_rt_warp_matches_reference_math():
    rot = RNG.uniform(-45, 45, size=(2, 3)).astype(np.float32)
    trans = RNG.uniform(-0.3, 0.3, size=(2, 3)).astype(np.float32)
    for invert in (False, True):
        got = compute_rt_warp(
            jnp.asarray(rot), jnp.asarray(trans), invert=invert, grid_size=16
        )
        # Torch re-derivation of reference compute_rt_warp (model.py:777-809).
        rotation_matrix = torch.from_numpy(
            np.asarray(rotation_matrix_from_euler_deg(jnp.asarray(rot)))
        )
        affine = torch.eye(4).repeat(2, 1, 1)
        affine[:, :3, :3] = rotation_matrix
        affine[:, :3, 3] = torch.from_numpy(trans)
        if invert:
            affine = torch.inverse(affine)
        grid = F.affine_grid(affine[:, :3], (2, 1, 16, 16, 16), align_corners=False)
        # Reference permutes to [B,3,D,H,W]; ours stays [B,D,H,W,3].
        assert_close(got, grid, atol=1e-5)


@pytest.mark.parametrize("align", [True])
@pytest.mark.parametrize("impl", ["block", "block_xc", "corners"])
def test_grid_sample_3d_matches_torch(align, impl):
    v = RNG.standard_normal((2, 5, 7, 6, 4), dtype=np.float32)
    coords = RNG.uniform(-1.4, 1.4, size=(2, 3, 4, 5, 3)).astype(np.float32)
    got = grid_sample_3d(jnp.asarray(v), jnp.asarray(coords),
                         align_corners=align, impl=impl)
    ref = F.grid_sample(
        torch.from_numpy(v).permute(0, 4, 1, 2, 3),
        torch.from_numpy(coords),
        mode="bilinear",
        padding_mode="border",
        align_corners=align,
    ).permute(0, 2, 3, 4, 1)
    assert_close(got, ref, atol=1e-5)


def test_apply_warping_field_matches_reference_pipeline():
    """End-to-end parity with reference apply_warping_field (model.py:1028)."""
    b, c, d, h, w = 2, 8, 4, 16, 16
    v = RNG.standard_normal((b, d, h, w, c), dtype=np.float32)
    flow = RNG.uniform(-1, 1, size=(b, 16, 16, 16, 3)).astype(np.float32)

    got = apply_warping_field(
        jnp.asarray(v), jnp.asarray(flow), normalize_mode="reference"
    )

    # Torch re-derivation, step for step.
    vt = torch.from_numpy(v).permute(0, 4, 1, 2, 3)  # [B,C,D,H,W]
    ft = torch.from_numpy(flow).permute(0, 4, 1, 2, 3)  # [B,3,D,H,W]
    ft = F.interpolate(ft, size=(d, h, w), mode="trilinear", align_corners=True)
    dd = torch.linspace(-1, 1, d)
    hh = torch.linspace(-1, 1, h)
    ww = torch.linspace(-1, 1, w)
    gd, gh, gw = torch.meshgrid(dd, hh, ww, indexing="ij")
    grid = torch.stack((gw, gh, gd), dim=-1).unsqueeze(0).repeat(b, 1, 1, 1, 1)
    warped = grid + ft.permute(0, 2, 3, 4, 1)
    norm = torch.tensor([w - 1, h - 1, d - 1], dtype=torch.float32)
    warped = 2.0 * warped / norm - 1.0
    ref = F.grid_sample(
        vt, warped, mode="bilinear", padding_mode="border", align_corners=True
    ).permute(0, 2, 3, 4, 1)
    assert_close(got, ref, atol=1e-5)


def test_apply_warping_field_standard_mode_identity():
    """Zero flow in 'standard' mode must be an exact identity warp."""
    v = RNG.standard_normal((1, 4, 8, 8, 3), dtype=np.float32)
    flow = np.zeros((1, 4, 8, 8, 3), dtype=np.float32)
    got = apply_warping_field(
        jnp.asarray(v), jnp.asarray(flow), normalize_mode="standard"
    )
    np.testing.assert_allclose(np.asarray(got), v, atol=1e-5)


def test_grid_sample_3d_is_differentiable():
    import jax

    v = jnp.asarray(RNG.standard_normal((1, 4, 8, 8, 3), dtype=np.float32))
    coords = jnp.asarray(
        RNG.uniform(-0.9, 0.9, size=(1, 4, 8, 8, 3)).astype(np.float32)
    )

    def loss(v, coords):
        return jnp.sum(grid_sample_3d(v, coords) ** 2)

    gv, gc = jax.grad(loss, argnums=(0, 1))(v, coords)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gc)).all()
    assert float(jnp.abs(gc).max()) > 0.0


def test_grid_sample_3d_gradients_match_torch():
    """Backward parity: d(sum(grid_sample))/d{v, coords} vs torch autograd."""
    import jax

    v = RNG.standard_normal((1, 4, 6, 5, 3)).astype(np.float32)
    coords = RNG.uniform(-0.9, 0.9, (1, 3, 4, 4, 3)).astype(np.float32)

    def loss_jax(v_, c_):
        return jnp.sum(grid_sample_3d(jnp.asarray(v_), jnp.asarray(c_)))

    gv, gc = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(v),
                                                jnp.asarray(coords))

    vt = torch.from_numpy(v).permute(0, 4, 1, 2, 3).requires_grad_(True)
    ct = torch.from_numpy(coords).requires_grad_(True)
    out = F.grid_sample(vt, ct, mode="bilinear", padding_mode="border",
                        align_corners=True)
    out.sum().backward()
    np.testing.assert_allclose(
        np.asarray(gv), vt.grad.permute(0, 2, 3, 4, 1).numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(gc), ct.grad.numpy(), atol=1e-4)
