"""TPU-native equivalents of the vendored ROME loss library.

The reference vendors SamsungLabs/rome losses wholesale (rome_losses.py,
1,866 LoC; README.md:231-232) though its active trainers import only the
Vgg19 feature extractor (train_highres.py:20). For component parity
(SURVEY.md section 2.2) the full catalogue is reimplemented here on jnp,
channels-last, fully jittable:

  AdversarialLoss (multi-discriminator, multi-input hinge)  rome_losses.py:9
  PSNR                                                      :75
  make_grid / Transform (random affine + TPS, jacobian)     :96-169
  EquivarianceLoss                                          :172
  LaplaceMeshLoss (uniform Laplacian)                       :192
  FeatureMatchingLoss                                       :257
  KeypointsMatchingLoss (68-kp face weighting)              :302
  SegmentationLoss (bce_with_logits / dice)                 :1500
  MultiScaleSilhouetteLoss (bce / mse / iou)                :1531
  LipClosureLoss / EyeClosureLoss                           :1573/:1596
  HeadPoseMatchingLoss                                      :1621
  chamfer_distance                                          :1344
  apply_imagenet_normalization                              :388

The gradient-based pieces (Transform.jacobian) use jax.jacfwd instead of
torch autograd.grad — exact, and traced into the same XLA graph.
LPIPS / perceptual-backbone losses live in losses/perceptual.py;
VGGFace2Loss in losses/vggface.py.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from megaportraits_tpu.ops.resize import linear_resize, nearest_resize
from megaportraits_tpu.ops.warp import grid_sample_2d

Array = jnp.ndarray
ScoreLists = Sequence[Sequence[Array]]


def adversarial_loss(
    fake_scores: ScoreLists,
    real_scores: ScoreLists = None,
    mode: str = "gen",
    loss_type: str = "hinge",
) -> Array:
    """Multi-discriminator hinge loss (rome_losses.py:9-72)."""
    assert loss_type == "hinge", "reference implements hinge only"
    loss = jnp.float32(0.0)
    if mode == "dis":
        for real_net, fake_net in zip(real_scores, fake_scores):
            lr = sum(jnp.mean(jax.nn.relu(1.0 - r)) for r in real_net)
            lf = sum(jnp.mean(jax.nn.relu(1.0 + f)) for f in fake_net)
            loss = loss + lr / len(real_net) + lf / len(fake_net)
    elif mode == "gen":
        for fake_net in fake_scores:
            ln = sum(-jnp.mean(f) for f in fake_net)
            loss = loss + ln / len(fake_net)
    else:
        raise ValueError(mode)
    return loss / len(fake_scores)


def psnr(pred: Array, target: Array, data_range: float = 1.0) -> Array:
    """rome_losses.py:75-93."""
    mse = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    )
    return 10.0 * jnp.log10(data_range**2 / mse)


@functools.lru_cache(maxsize=None)
def make_grid(h: int, w: int) -> np.ndarray:
    """[1, h*w, 2] identity grid in [-1,1], (x, y) (rome_losses.py:96-103)."""
    xs = np.linspace(-1.0, 1.0, w)
    ys = np.linspace(-1.0, 1.0, h)
    grid = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(1, -1, 2)
    return grid.astype(np.float32)


class Transform:
    """Random affine + TPS image transform (rome_losses.py:105-169).

    Functional: construct with an rng key and a batch size; `transform_img`
    and `warp_pts` are pure and jit-friendly.
    """

    def __init__(self, rng: jax.Array, batch: int, sigma_affine: float,
                 sigma_tps: float, points_tps: int):
        k1, k2 = jax.random.split(rng)
        noise = jax.random.normal(k1, (batch, 2, 3)) * sigma_affine
        eye = jnp.concatenate([jnp.eye(2), jnp.zeros((2, 1))], axis=1)
        self.theta = (noise + eye[None])[:, None]  # [b, 1, 2, 3]
        self.control_grid = jnp.asarray(make_grid(points_tps, points_tps))
        self.control_params = (
            jax.random.normal(k2, (batch, 1, points_tps**2)) * sigma_tps
        )

    def warp_pts(self, pts: Array) -> Array:
        """pts [1 or b, n, 2] -> warped [b, n, 2].

        Affine part + a per-point TPS radial term; like the reference, the
        same scalar TPS offset is added to both coordinates
        (rome_losses.py:150-160).
        """
        pts_t = jnp.einsum("boij,pnj->bni", self.theta[..., :2], pts)
        pts_t = pts_t + self.theta[:, 0, :, 2][:, None, :]
        # pdists: [b_or_1, n, k] L1 distances to control points.
        pdists = jnp.abs(pts[:, :, None] - self.control_grid[:, None]).sum(-1)
        radial = pdists**2 * jnp.log(pdists + 1e-5)
        result = jnp.sum(radial * self.control_params, axis=-1,
                         keepdims=True)  # [b, n, 1]
        return pts_t + result

    def transform_img(self, img: Array) -> Array:
        """img [B, H, W, C] -> TPS-warped img (reflection padding)."""
        b, h, w, _ = img.shape
        grid = jnp.asarray(make_grid(h, w))
        warped = self.warp_pts(grid).reshape(b, h, w, 2)
        return grid_sample_2d(img, warped, align_corners=False,
                              padding_mode="reflection")

    def jacobian(self, pts: Array) -> Array:
        """d warp_pts / d pts, per point: [b, n, 2, 2] via jacfwd."""

        def single(p):  # p: [2] -> [b, 2] warped positions for this point
            out = self.warp_pts(p[None, None, :])  # [b, 1, 2]
            return out[:, 0, :]

        jac = jax.vmap(jax.jacfwd(single))(pts.reshape(-1, 2))  # [n, b, 2, 2]
        return jnp.transpose(jac, (1, 0, 2, 3))


def equivariance_loss(
    img: Array,
    kp: Array,
    jac: Array,
    kp_detector: Callable[[Array], Tuple[Array, Array]],
    transform: Transform,
) -> Tuple[Array, Array, Array, Array, Array]:
    """rome_losses.py:172-189. kp [b,n,2] in [-1,1]; jac [b,n,2,2]."""
    img_t = transform.transform_img(img)
    kp_t, jac_t = kp_detector(img_t)
    kp_recon = transform.warp_pts(kp_t)
    loss_kp = jnp.mean(jnp.abs(kp - kp_recon))

    jac_recon = jnp.matmul(transform.jacobian(kp_t), jac_t)
    inv_jac = jnp.linalg.inv(jac)
    eye = jnp.eye(2)[None, None]
    loss_jac = jnp.mean(jnp.abs(jnp.matmul(inv_jac, jac_recon) - eye))
    return loss_kp, loss_jac, img_t, kp_t, kp_recon


def laplace_mesh_loss(verts: Array, faces: np.ndarray) -> Array:
    """Uniform-Laplacian mesh smoothing loss (rome_losses.py:192-254).

    verts [B, V, 3]; faces [F, 3] int (static). L2 norm of the uniform
    Laplacian applied to vertex positions.
    """
    v = verts.astype(jnp.float32)
    nv = v.shape[1]
    # Static adjacency from faces.
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]], axis=0)
    edges = np.unique(np.sort(edges, axis=1), axis=0)
    adj = np.zeros((nv, nv), dtype=np.float32)
    adj[edges[:, 0], edges[:, 1]] = 1.0
    adj[edges[:, 1], edges[:, 0]] = 1.0
    deg = adj.sum(1, keepdims=True)
    lap = adj / np.maximum(deg, 1.0)
    lap_op = jnp.asarray(lap)
    delta = jnp.einsum("vu,buc->bvc", lap_op, v) - v
    return jnp.mean(jnp.linalg.norm(delta, axis=-1))


def feature_matching_loss(
    real_features, fake_features, loss_type: str = "l1"
) -> Array:
    """Nested multi-disc/multi-layer/multi-input FM loss (rome_losses.py:257)."""
    loss = jnp.float32(0.0)
    for real_net, fake_net in zip(real_features, fake_features):
        loss_net = jnp.float32(0.0)
        for real_layer, fake_layer in zip(real_net, fake_net):
            if len(real_layer) == 1:
                real_layer = [real_layer[0]] * len(fake_layer)
            for r, f in zip(real_layer, fake_layer):
                diff = f.astype(jnp.float32) - r.astype(jnp.float32)
                loss_net = loss_net + (
                    jnp.mean(jnp.abs(diff)) if loss_type == "l1"
                    else jnp.mean(diff**2)
                )
        loss_net = loss_net / len(fake_layer) / len(fake_net)
        loss = loss + loss_net
    return loss / len(real_features)


_KP68_WEIGHTS = np.ones(68, dtype=np.float32)
_KP68_WEIGHTS[5:7] = 2.0
_KP68_WEIGHTS[10:12] = 2.0
_KP68_WEIGHTS[27:36] = 1.5
_KP68_WEIGHTS[30] = 3.0
_KP68_WEIGHTS[31] = 3.0
_KP68_WEIGHTS[35] = 3.0
_KP68_WEIGHTS[60:68] = 1.5
_KP68_WEIGHTS[48:60] = 1.5
_KP68_WEIGHTS[48] = 3.0
_KP68_WEIGHTS[54] = 3.0


def keypoints_matching_loss(pred_keypoints: Array, keypoints: Array) -> Array:
    """Weighted 68-landmark L1 (rome_losses.py:302-328)."""
    w = jnp.asarray(_KP68_WEIGHTS)
    diff = jnp.abs(pred_keypoints - keypoints).mean(-1)  # [b, 68]
    return jnp.mean(jnp.sum(diff * w[None] / w.sum(), axis=-1))


def segmentation_loss(pred_seg_logits: Array, target_segs: Array,
                      loss_type: str = "bce_with_logits") -> Array:
    """rome_losses.py:1500-1528. NHWC masks."""
    if target_segs.shape[1] != pred_seg_logits.shape[1]:
        target_segs = linear_resize(
            target_segs, pred_seg_logits.shape[1:3], axes=(1, 2),
            align_corners=False,
        )
    p = pred_seg_logits.astype(jnp.float32)
    t = target_segs.astype(jnp.float32)
    if loss_type == "bce_with_logits":
        return jnp.mean(optax.sigmoid_binary_cross_entropy(p, t))
    if loss_type == "dice":
        pred = jax.nn.sigmoid(p).reshape(p.shape[0], -1)
        tgt = t.reshape(t.shape[0], -1)
        inter = jnp.mean(pred * tgt, axis=1)
        card = jnp.mean(pred**2 + tgt**2, axis=1)
        return 1.0 - jnp.mean(2.0 * inter / (card + 1e-7))
    raise ValueError(loss_type)


def multi_scale_silhouette_loss(inputs: Array, targets: Array,
                                num_scales: int = 1,
                                loss_type: str = "bce") -> Array:
    """rome_losses.py:1531-1570. NHWC silhouettes in [0,1]."""
    size = targets.shape[1]
    loss = jnp.float32(0.0)
    x, gt = inputs.astype(jnp.float32), targets.astype(jnp.float32)
    for i in range(num_scales):
        if i > 0:
            s = size // (2**i)
            x = nearest_resize(inputs.astype(jnp.float32), (s, s), axes=(1, 2))
            gt = nearest_resize(targets.astype(jnp.float32), (s, s), axes=(1, 2))
        if loss_type == "iou":
            inter = jnp.mean((x * gt).reshape(x.shape[0], -1), axis=1)
            union = jnp.mean((x + gt).reshape(x.shape[0], -1), axis=1)
            loss = loss + 1.0 - jnp.mean(inter / (union - inter))
        elif loss_type == "mse":
            loss = loss + jnp.mean((x - gt) ** 2)
        elif loss_type == "bce":
            eps = 1e-7
            xc = jnp.clip(x, eps, 1 - eps)
            loss = loss - jnp.mean(
                gt * jnp.log(xc) + (1 - gt) * jnp.log(1 - xc)
            )
        else:
            raise ValueError(loss_type)
    return loss / num_scales


_UPPER_LIPS = np.array([61, 62, 63])
_LOWER_LIPS = np.array([67, 66, 65])
_UPPER_LIDS = np.array([37, 38, 43, 44])
_LOWER_LIDS = np.array([41, 40, 47, 46])


def _closure_loss(pred_kp, kp, upper, lower) -> Array:
    dp = pred_kp[:, upper] - pred_kp[:, lower]
    dt = kp[:, upper] - kp[:, lower]
    return jnp.mean(jnp.abs(jnp.abs(dp).sum(-1) - jnp.abs(dt).sum(-1)))


def lip_closure_loss(pred_keypoints: Array, keypoints: Array) -> Array:
    """rome_losses.py:1573-1593."""
    return _closure_loss(pred_keypoints, keypoints, _UPPER_LIPS, _LOWER_LIPS)


def eye_closure_loss(pred_keypoints: Array, keypoints: Array) -> Array:
    """rome_losses.py:1596-1618."""
    return _closure_loss(pred_keypoints, keypoints, _UPPER_LIDS, _LOWER_LIDS)


def head_pose_matching_loss(pred_thetas, target_thetas,
                            loss_type: str = "l2") -> Array:
    """rome_losses.py:1621-1655."""
    if not isinstance(pred_thetas, (list, tuple)):
        pred_thetas = [pred_thetas]
        target_thetas = [target_thetas]
    loss = jnp.float32(0.0)
    for p, t in zip(pred_thetas, target_thetas):
        d = p.astype(jnp.float32) - t.astype(jnp.float32)
        loss = loss + (jnp.mean(jnp.abs(d)) if loss_type == "l1"
                       else jnp.mean(d**2))
    return loss


def chamfer_distance(x: Array, y: Array) -> Tuple[Array, Array]:
    """Symmetric chamfer distance between point sets [B, N, D] / [B, M, D]
    (rome_losses.py:1344-1497, dense-distance form)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    d2 = jnp.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1)
    cham_x = jnp.min(d2, axis=2)  # [B, N]
    cham_y = jnp.min(d2, axis=1)  # [B, M]
    return jnp.mean(cham_x), jnp.mean(cham_y)


def apply_imagenet_normalization(x: Array) -> Array:
    """rome_losses.py:388-400, NHWC."""
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)
    return (x.astype(jnp.float32) - mean) / std
