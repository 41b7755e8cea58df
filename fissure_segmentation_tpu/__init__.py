"""fissure_segmentation_tpu — TPU-native fissure/lobe segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
`kaftanski/fissure-segmentation` (PyTorch, single-GPU): geometric deep learning
on sparse CT keypoint clouds, classical image-processing keypoint front-ends,
differentiable Poisson surface reconstruction back-end, cross-validation
training harness and mesh-distance evaluation — built TPU-first (SPMD over
device meshes, functional transforms, static shapes, Pallas kernels for
neighborhood ops).

Layout (mirrors SURVEY.md §7 build plan):
  utils/      core tensor layer: coordinates, separable filters, patch gather,
              NIfTI/OBJ IO, profiling (XLA cost analysis), visualization
  ops/        point-cloud kernel pack: kNN, edge features, FPS, splat, eigen
  models/     flax.linen model families (DGCNN, PointNet, PointTransformer,
              FoldingNet PC-AE, DG-SSM, DPSR-Net, 3-D seg CNNs v1/v3)
  losses/     CE+GDL, recall, Chamfer, mesh, DG-SSM, DPSR losses + registry
  data/       point/image/mesh/corresponding-point datasets, splits,
              augmentation, synthetic data, NIfTI folder index
  keypoints/  Förstner, Hessian enhancement, MIND features, KP dispatcher
  preprocess/ lobes<->fissures GT generation, crops, mesh GT, label pipeline
  shape_model/ SSM + localized LSSM, CPD/TPS registration, correspondences
  parallel/   device mesh helpers, sharded ensemble inference, spatial
              (z-slab) sharding with halo-exchange collectives
  native/     first-party C++ host runtime (connected components, BVH
              point->mesh distance, triangle voxelization, morphology)
  postprocess/ spectral Poisson surface fitting, marching cubes, random walk,
              plane fitting, mesh utils
  train/      point/image trainers (resumable), cross-validation, evaluation
  cli/        argparse-compatible flag surface + args persistence
  metrics.py  Dice / ASSD / SDSD / HD / HD95 on device
"""

__version__ = "0.1.0"
