"""megaportraits_tpu — a TPU-native JAX/XLA/Pallas framework for one-shot
megapixel neural head avatars (MegaPortraits).

A ground-up rebuild of the capabilities of johndpope/MegaPortrait-hack
(PyTorch, single-GPU) as an idiomatic TPU framework:

  * channels-last (NHWC / NDHWC) convolutional models compiled by XLA onto
    the MXU, bfloat16 compute with float32 parameters,
  * the hot 3D flow-field application (trilinear grid-sample over
    16x64x64 feature volumes) as a fused op with a Pallas kernel path,
  * data-parallel / sharded training via jax.sharding.Mesh + jit,
  * Orbax checkpointing, optax AdamW + cosine schedules,
  * a host-side video preprocessing pipeline with the same npz cache
    contract as the reference EmoDataset.

Layer map (mirrors SURVEY.md section 7):
  core/      dtype policy, config, checkpointing, PRNG utilities
  ops/       resize / affine-grid / 3D warp (XLA + Pallas kernels)
  nn/        conv & norm & resblock module library (flax.linen)
  models/    Eapp, Emtn (+RepVGG/ResNet), warp generators, G3d, G2d,
             Gbase, Genh, GHR, Student, Discriminator
  losses/    perceptual (VGG19/VGGFace/LPIPS ports), GAN, cycle, pairwise
  data/      EmoDataset equivalent (video -> npz cache -> device feed)
  parallel/  mesh + sharding helpers (DP/FSDP over ICI)
  train/     train_base / train_hr / train_student loops
  infer/     inference entry points (parity with reference inference.py)
  eval/      L1/LPIPS/PSNR/SSIM/AKD/AED metric suite
"""

__version__ = "0.1.0"
