"""pcf_tpu — a TPU-native JAX/Pallas rebuild of PointConvFormer.

A from-scratch reimplementation (not a port) of the capabilities of
Deep-Machine-Vision/ml-pointconvformer: point-cloud semantic segmentation with
PointConvFormer (Wu, Fuxin, Shan — CVPR 2023), redesigned around XLA/Pallas:

- brute-force kNN as tiled distance-matrix + top-k (replaces nanoflann/KeOps/cuVS)
- grid subsampling as voxel-hash + segment reductions (replaces cpp_subsampling)
- the fused PConv/PCF contractions as XLA einsum reference paths plus Pallas
  fused kernels (replaces the CUDA/CUTLASS pcf_cuda extension)
- static-shape packed batching for variable-size scenes
- data parallelism via jit + shard_map over a TPU mesh (replaces DDP/NCCL)

Public API parity targets the reference's model_architecture.py / layers.py /
layer_utils.py / datasetCommon.py surface; see SURVEY.md for the component map.
"""

from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs, load_config

__version__ = "0.1.0"
