"""Load the converted pretrained bundle and graft it into model variables.

The bundle is produced by ``scripts/convert_weights.py`` (Orbax, step 0)
with keys among: vgg19, vgg16, lpips_heads, vggface, sixdrepnet, resnet18,
resnet50. These cover the reference's runtime downloads (SURVEY.md §2.5,
reference model.py:1935-1947, mysixdrepnet.py:792).

Grafting targets:
  * PerceptualLoss: vgg19 trunk, LPIPS (vgg16 trunk + lin heads), vggface.
  * Gbase: Emtn's frozen SixDRepNet rotation net (motion_encoder/
    rotation_net) and the resnet18 trunks of the head-pose/expression heads
    (fc layers stay random — the reference also replaces them, model.py:874).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import numpy as np


def load_bundle(path: str) -> Optional[Dict[str, Any]]:
    """Restore the raw bundle dict; None if no checkpoint exists."""
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    mgr = ocp.CheckpointManager(path)
    step = mgr.latest_step()
    if step is None:
        return None
    out = mgr.restore(step)
    mgr.close()
    return out


def _merge_loose(target: dict, source: dict, path: str = "") -> int:
    """Overwrite target leaves present in source (shape-checked); returns
    the number of leaves replaced. Unknown source keys are skipped (loose,
    strict=False-style), unlike torch_convert.merge_params."""
    n = 0
    for key, value in source.items():
        if key not in target:
            continue
        if isinstance(value, dict) and isinstance(target[key], dict):
            n += _merge_loose(target[key], value, f"{path}/{key}")
        else:
            tgt = np.asarray(target[key])
            src = np.asarray(value)
            if tgt.shape != src.shape:
                raise ValueError(
                    f"shape mismatch at {path}/{key}: "
                    f"{tgt.shape} vs {src.shape}"
                )
            target[key] = src.astype(tgt.dtype)
            n += 1
    return n


def apply_to_perceptual(p_vars: dict, bundle: Dict[str, Any]):
    """Graft vgg19 / lpips / vggface weights into PerceptualLoss variables.

    Returns (new_p_vars, n_leaves_grafted)."""
    out = copy.deepcopy(dict(p_vars))
    params = out["params"]
    n = 0
    if "vgg19" in bundle and "vgg19" in params:
        n += _merge_loose(params["vgg19"], bundle["vgg19"], "vgg19")
    if "lpips" in params:
        if "vgg16" in bundle:
            n += _merge_loose(params["lpips"].setdefault("vgg16", {}),
                              bundle["vgg16"], "lpips/vgg16")
        if "lpips_heads" in bundle:
            n += _merge_loose(params["lpips"], bundle["lpips_heads"],
                              "lpips")
    if "vggface" in bundle and "vggface" in params:
        n += _merge_loose(params["vggface"], bundle["vggface"], "vggface")
    return out, n


def apply_to_gbase(variables: dict, bundle: Dict[str, Any]):
    """Graft SixDRepNet + resnet18 trunks into Gbase variables.

    Returns (new_variables, n_leaves_grafted); also sets batch_stats for
    the resnet18 heads when present.
    """
    variables = copy.deepcopy(variables)
    params = variables["params"]
    stats = variables.get("batch_stats")
    emtn_p = params.get("motion_encoder", {})
    n = 0
    if "sixdrepnet" in bundle and "rotation_net" in emtn_p:
        n += _merge_loose(emtn_p["rotation_net"], bundle["sixdrepnet"],
                          "rotation_net")
    if "resnet18" in bundle:
        r18 = bundle["resnet18"]
        for head in ("head_pose_net", "expression_net"):
            if head in emtn_p:
                # Graft the TRUNK only: the torchvision fc is 1000-class;
                # the reference replaces it (model.py:874 fc->6) and so do
                # we — head fc layers stay at their fresh init.
                tgt_p = emtn_p[head]
                if "trunk" in tgt_p:
                    n += _merge_loose(tgt_p["trunk"],
                                      r18["params"]["trunk"],
                                      f"{head}/trunk")
                else:
                    n += _merge_loose(tgt_p, r18["params"]["trunk"], head)
                if stats is not None and head in stats.get(
                        "motion_encoder", {}):
                    tgt_s = stats["motion_encoder"][head]
                    src_s = r18["batch_stats"] if "trunk" in tgt_s \
                        else r18["batch_stats"]["trunk"]
                    _merge_loose(tgt_s, src_s, f"{head}/stats")
    return variables, n


def maybe_load_pretrained(
    bundle_path: Optional[str],
    g_variables: Optional[dict] = None,
    p_vars: Optional[dict] = None,
):
    """Convenience: load bundle if path given; graft into whichever trees
    are provided. Returns (g_variables, p_vars, report_str)."""
    if not bundle_path:
        return g_variables, p_vars, "pretrained: none"
    bundle = load_bundle(bundle_path)
    if bundle is None:
        return g_variables, p_vars, f"pretrained: no bundle at {bundle_path}"
    parts = []
    if g_variables is not None:
        g_variables, n = apply_to_gbase(g_variables, bundle)
        parts.append(f"gbase leaves={n}")
    if p_vars is not None:
        p_vars, n = apply_to_perceptual(p_vars, bundle)
        parts.append(f"ploss leaves={n}")
    return g_variables, p_vars, "pretrained: " + ", ".join(parts)
