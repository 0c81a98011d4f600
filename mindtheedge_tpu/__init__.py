"""MindTheEdge-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of liortalker/MindTheEdge (CVPR'24 "Mind The Edge": depth-edge
refined sparsely-supervised monocular depth estimation).

Subpackages
-----------
config      yacs-compatible config tree; the 3 reference YAMLs parse unchanged
ops         XLA/Pallas compute ops (packing, sparse SAN, sobel/canny/nms, ...)
models      networks (PackNet-SAN, PoseNet, ResNet) + task models
losses      supervised / edge (GradLoss) / photometric losses
geometry    pinhole camera, pose, view synthesis
data        datasets, readers, host preprocessing, device prefetch
training    jit train step, trainer, optimizer, checkpointing
evaluation  depth metrics, chamfer, D3R, BSDS edge AUC (C++ matcher)
parallel    device-mesh sharding (data-parallel over ICI)
"""

__version__ = '0.1.0'
