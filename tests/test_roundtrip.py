"""Train -> export -> infer round trip under the unified [0,1] contract
(VERDICT r1 item #5 'Done' criterion): a few production-driver steps, the
exported checkpoint served through the inference API, output distribution
sane — the checkpoint is consumed with IN-distribution inputs (the
reference's train/infer normalization mismatch cannot reoccur).
"""

import os

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_train_export_infer_roundtrip(tmp_path):
    from PIL import Image

    from megaportraits_tpu.core.checkpoint import CheckpointManager
    from megaportraits_tpu.core.config import Config
    from megaportraits_tpu.infer.inference import inference_base
    from megaportraits_tpu.train.main_base import train_base

    size = 64
    # Synthetic 2-clip dataset on disk.
    videos = tmp_path / "videos"
    videos.mkdir()
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for vid in ("clip_a", "clip_b"):
        w = cv2.VideoWriter(str(videos / f"{vid}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 25, (96, 96))
        base = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        for i in range(40):
            w.write(np.roll(base, 2 * i, axis=1))
        w.release()
    import json

    meta = videos / "meta.json"
    meta.write_text(json.dumps({"clips": {"clip_a": {}, "clip_b": {}}}))

    cfg = Config()
    cfg.data.train_width = cfg.data.train_height = size
    cfg.training.batch_size = 2
    cfg.training.n_sample_frames = 4
    cfg.training.sample_rate = 10
    cfg.training.video_dir = str(videos)
    cfg.training.json_file = str(meta)
    cfg.training.checkpoint_path = str(tmp_path / "ckpt")
    cfg.training.save_interval = 2
    cfg.training.log_interval = 100
    cfg.training.use_bf16 = False  # CPU tier
    cfg.training.steps_per_epoch = 2
    cfg.training.pretrained_path = ""
    metrics = train_base(cfg, max_steps=2)
    assert np.isfinite(metrics["loss_G"])

    # The export payload must exist and serve through the inference API
    # with [0,1] inputs (no reference_normalize).
    export = CheckpointManager(cfg.training.checkpoint_path + "/export")
    assert export.latest_step() is not None

    src = tmp_path / "src.png"
    drv = tmp_path / "drv.png"
    img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
    Image.fromarray(img).save(src)
    Image.fromarray(np.roll(img, 5, axis=1)).save(drv)

    model = cfg.make_gbase()
    dummy = np.zeros((1, size, size, 3), np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    dummy, dummy)
    restored = export.restore({"g_variables": variables})
    assert restored is not None
    out = inference_base(str(src), str(drv), restored["g_variables"],
                         model, size=(size, size))
    assert out.shape == (size, size, 3) and out.dtype == np.uint8
    # Sigmoid output scaled to bytes: must use a real value range, not
    # collapse to black/white.
    assert 2 < out.mean() < 253
    assert out.std() > 1.0
