"""fissure_segmentation_tpu — TPU-native fissure/lobe segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
`kaftanski/fissure-segmentation` (PyTorch, single-GPU): geometric deep learning
on sparse CT keypoint clouds, classical image-processing keypoint front-ends,
differentiable Poisson surface reconstruction back-end, cross-validation
training harness and mesh-distance evaluation — built TPU-first (SPMD over
device meshes, functional transforms, static shapes, Pallas kernels for
neighborhood ops).

Layout (mirrors SURVEY.md §7 build plan):
  utils/      core tensor layer: coordinates, separable filters, patch gather
  ops/        point-cloud kernel pack: kNN, edge features, FPS, splat, eigen
  models/     flax.linen model families (DGCNN, PointNet, PointTransformer,
              FoldingNet PC-AE, DG-SSM, DPSR-Net, 3-D seg CNNs)
  losses/     CE+GDL, recall, Chamfer, mesh, DG-SSM, DPSR losses + registry
  data/       point-cloud datasets, splits, augmentation, synthetic data
  parallel/   device mesh helpers, sharded ensemble inference, spatial tiling
  postprocess/ spectral Poisson surface fitting, marching cubes, mesh utils
  train/      trainer + cross-validation harness
  metrics.py  Dice / ASSD / SDSD / HD / HD95 on device
"""

__version__ = "0.1.0"
