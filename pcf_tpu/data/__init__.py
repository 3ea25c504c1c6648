from pcf_tpu.data.pyramid import compute_knn, subsample, subsample_and_knn
from pcf_tpu.data.synthetic import synthetic_scene
