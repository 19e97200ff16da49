"""pixelsplat_tpu: a TPU-native (JAX/XLA/Pallas) generalizable 3D Gaussian
splatting framework with the capabilities of dcharatan/pixelsplat.

Layer map (bottom-up):
  ops/rasterizer  — differentiable tile-based Gaussian splatting (XLA + Pallas)
  geometry        — projection + epipolar-line math
  model           — epipolar-transformer encoder, Gaussian adapter, decoder
  dataset         — RE10K/ACID chunked-dataset input pipeline + view samplers
  loss/evaluation — MSE/LPIPS/depth losses, PSNR/SSIM/LPIPS metrics
  training        — pjit data-parallel train loop, checkpointing
  parallel        — mesh/sharding helpers
"""

__version__ = "0.1.0"
