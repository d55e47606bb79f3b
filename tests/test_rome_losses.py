"""Tests for the ROME loss suite (losses/rome.py) incl. torch parity for
the tricky pieces (adversarial nesting, keypoint weighting, TPS transform
structure)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from megaportraits_tpu.losses import rome

RNG = np.random.default_rng(3)


def test_adversarial_loss_matches_reference_nesting():
    fake = [[RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
             for _ in range(2)] for _ in range(3)]
    real = [[RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
             for _ in range(2)] for _ in range(3)]

    got_gen = rome.adversarial_loss(
        [[jnp.asarray(s) for s in net] for net in fake], mode="gen"
    )
    got_dis = rome.adversarial_loss(
        [[jnp.asarray(s) for s in net] for net in fake],
        [[jnp.asarray(s) for s in net] for net in real],
        mode="dis",
    )

    # torch re-derivation (rome_losses.py:9-72)
    loss_g = 0.0
    for net in fake:
        ln = sum(-torch.from_numpy(s).mean() for s in net) / len(net)
        loss_g = loss_g + ln
    loss_g /= len(fake)
    np.testing.assert_allclose(float(got_gen), float(loss_g), rtol=1e-5)

    loss_d = 0.0
    for rn, fn in zip(real, fake):
        lr = sum(torch.relu(1.0 - torch.from_numpy(s)).mean() for s in rn) / len(rn)
        lf = sum(torch.relu(1.0 + torch.from_numpy(s)).mean() for s in fn) / len(fn)
        loss_d = loss_d + lr + lf
    loss_d /= len(fake)
    np.testing.assert_allclose(float(got_dis), float(loss_d), rtol=1e-5)


def test_keypoints_matching_loss_weights():
    pred = RNG.standard_normal((2, 68, 2)).astype(np.float32)
    kp = RNG.standard_normal((2, 68, 2)).astype(np.float32)
    got = rome.keypoints_matching_loss(jnp.asarray(pred), jnp.asarray(kp))

    w = torch.ones(68)
    w[5:7] = 2.0; w[10:12] = 2.0; w[27:36] = 1.5; w[30] = 3.0; w[31] = 3.0
    w[35] = 3.0; w[60:68] = 1.5; w[48:60] = 1.5; w[48] = 3; w[54] = 3
    diff = torch.from_numpy(pred) - torch.from_numpy(kp)
    ref = (diff.abs().mean(-1) * w[None] / w.sum()).sum(-1).mean()
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_psnr_and_segmentation_and_silhouette():
    a = RNG.random((2, 8, 8, 1)).astype(np.float32)
    b = RNG.random((2, 8, 8, 1)).astype(np.float32)
    assert float(rome.psnr(jnp.asarray(a), jnp.asarray(a))) > 60
    bce = rome.segmentation_loss(jnp.asarray(a * 4 - 2), jnp.asarray((b > 0.5)
                                 .astype(np.float32)))
    assert np.isfinite(float(bce))
    dice = rome.segmentation_loss(jnp.asarray(a * 4 - 2),
                                  jnp.asarray((b > 0.5).astype(np.float32)),
                                  loss_type="dice")
    assert 0.0 <= float(dice) <= 1.0
    sil = rome.multi_scale_silhouette_loss(jnp.asarray(a), jnp.asarray(b),
                                           num_scales=2, loss_type="mse")
    assert np.isfinite(float(sil))


def test_closure_losses_zero_for_identical():
    kp = RNG.standard_normal((2, 68, 2)).astype(np.float32)
    assert float(rome.lip_closure_loss(jnp.asarray(kp), jnp.asarray(kp))) == 0.0
    assert float(rome.eye_closure_loss(jnp.asarray(kp), jnp.asarray(kp))) == 0.0


def test_transform_tps_and_jacobian():
    t = rome.Transform(jax.random.PRNGKey(0), batch=2, sigma_affine=0.05,
                       sigma_tps=0.005, points_tps=3)
    img = jnp.asarray(RNG.random((2, 16, 16, 3)).astype(np.float32))
    out = t.transform_img(img)
    assert out.shape == img.shape
    pts = jnp.asarray(RNG.uniform(-1, 1, (1, 5, 2)).astype(np.float32))
    warped = t.warp_pts(pts)
    assert warped.shape == (2, 5, 2)
    jac = t.jacobian(pts[0])
    assert jac.shape == (2, 5, 2, 2)
    # Near-identity transform -> jacobian near identity.
    assert np.abs(np.asarray(jac) - np.eye(2)).max() < 0.5


def test_chamfer_distance_zero_for_same_set():
    x = jnp.asarray(RNG.random((2, 10, 3)).astype(np.float32))
    cx, cy = rome.chamfer_distance(x, x)
    np.testing.assert_allclose(float(cx), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(cy), 0.0, atol=1e-6)


def test_laplace_mesh_loss_flat_mesh():
    # A single triangle: uniform laplacian of its own vertices.
    verts = jnp.asarray(RNG.random((1, 3, 3)).astype(np.float32))
    faces = np.array([[0, 1, 2]])
    loss = rome.laplace_mesh_loss(verts, faces)
    assert np.isfinite(float(loss))


def test_warp_alt_headpose_decode():
    from megaportraits_tpu.ops.warp_alt import (
        compute_rt_warp2,
        headpose_pred_to_degree,
    )

    logits = RNG.standard_normal((2, 66)).astype(np.float32)
    deg = headpose_pred_to_degree(jnp.asarray(logits))
    pt = torch.from_numpy(logits)
    idx = torch.arange(66).float()
    ref = torch.sum(torch.softmax(pt, 1) * idx, 1) * 3 - 99
    np.testing.assert_allclose(np.asarray(deg), ref.numpy(), rtol=1e-4,
                               atol=1e-4)

    warp = compute_rt_warp2(
        (jnp.asarray(logits), jnp.asarray(logits), jnp.asarray(logits)),
        jnp.zeros((2, 3)),
        grid_size=(4, 8, 8),
    )
    assert warp.shape == (2, 4, 8, 8, 3)


def test_grid_sample_2d_reflection_matches_torch():
    from megaportraits_tpu.ops.warp import grid_sample_2d

    v = RNG.standard_normal((2, 7, 9, 3)).astype(np.float32)
    coords = RNG.uniform(-1.5, 1.5, (2, 5, 6, 2)).astype(np.float32)
    for mode in ("border", "reflection", "zeros"):
        got = grid_sample_2d(jnp.asarray(v), jnp.asarray(coords),
                             align_corners=False, padding_mode=mode)
        ref = F.grid_sample(
            torch.from_numpy(v).permute(0, 3, 1, 2),
            torch.from_numpy(coords),
            mode="bilinear", padding_mode=mode, align_corners=False,
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4,
                                   err_msg=mode)
