from pcf_tpu.nn.norm import MaskedBatchNorm, LinearBN, UnaryBlock
from pcf_tpu.nn.weightnet import WeightNet
from pcf_tpu.nn.guidance import MultiHeadGuidance, MultiHeadGuidanceQK
from pcf_tpu.nn.layers import (
    PointConv,
    PointConvStridePE,
    PCFLayer,
    PointConvTransposePE,
    PointTransformerLayer,
    DropPath,
)
