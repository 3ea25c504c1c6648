from pcf_tpu.ops.pallas.pconv_kernel import (
    pconv_linear_fused,
    pcf_linear_fused,
)
