"""happypose_tpu — a TPU-native 6D object-pose estimation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
agimus-project/happypose (CosyPose + MegaPose):

- ``lib3d``:      SE(3)/rotation/camera/crop math as pure JAX ops.
- ``ops``:        Pallas rasterizer, ROI-align, segment/group ops.
- ``meshes``:     mesh IO + padded, device-shardable mesh database.
- ``models``:     Flax backbones + render-and-compare pose predictors.
- ``inference``:  CosyPose / MegaPose estimation pipelines (jitted).
- ``multiview``:  on-device RANSAC matching + Levenberg-Marquardt BA.
- ``training``:   disentangled pose losses, pjit data-parallel trainer.
- ``datasets``:   BOP scene/object datasets, augmentations.
- ``evaluation``: ADD(-S) meters, AUC, BOP export.
- ``parallel``:   mesh/sharding utilities (DP over batch, hypothesis-axis
                  sharding, object-asset sharding).

Unlike the reference (CUDA/torch + multiprocess OpenGL renderers), the whole
render->crop->CNN->SE(3)-update loop here lives on-chip inside a single jitted
computation; scaling is expressed with jax.sharding over a device Mesh.
"""

__version__ = "0.1.0"
