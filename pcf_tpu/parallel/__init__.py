from pcf_tpu.parallel.mesh import make_mesh, make_train_step, make_eval_step, stack_batches
from pcf_tpu.parallel.spatial import (make_spatial_eval_step, make_spatial_train_step, spatial_eval_forward)
