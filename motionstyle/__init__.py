"""motionstyle — TPU-native diffusion-based human motion style transfer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hlcdyy/diffusion-based-motion-style-transfer (Hu et al., CGF 2024):
a text-conditioned motion-diffusion prior with few-shot style finetuning
and trajectory-preserving inpainting style transfer.

Layer map (mirrors SURVEY.md §7):
  core/       rotation math, skeleton FK/IK, hml_vec feature codec
  diffusion/  schedules, DDPM/DDIM engines as lax.scan, inpainting, losses
  models/     MDM denoiser, StyleDiffusion, MotionEncoder, CLIP text tower
  data/       datasets, inpainting masks, collate
  train/      few-shot finetune loop, logging, platforms
  parallel/   mesh construction, sharded train/sample steps
  post/       foot-skate removal, BVH I/O, optimizer-based IK, rendering
  eval/       T2M metric stack (FID / R-precision / diversity)
  cli/        demo_style_transfer / finetune_style_diffusion entry points
  ops/        Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"
