from pcf_tpu.ops.gather import index_points
from pcf_tpu.ops.vi_transform import VI_coordinate_transform
from pcf_tpu.ops.knn import knn, knn_packed
from pcf_tpu.ops.voxelize import voxelize, voxel_cell_ids
from pcf_tpu.ops.subsample import grid_subsampling
from pcf_tpu.ops.pconv import (
    pconv,
    pconv_linear,
    pcf_conv,
    guided_contraction,
)
from pcf_tpu.ops.window import (
    WindowedEdges,
    build_windows,
    morton_argsort,
    plain_edges,
    windowed_take,
)
