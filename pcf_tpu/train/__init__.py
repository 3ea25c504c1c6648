from pcf_tpu.train.loss import cross_entropy_loss
from pcf_tpu.train.metrics import intersection_and_union
from pcf_tpu.train import lr
