from pcf_tpu.core.batching import PackedPyramid, compute_level_caps, pack_scenes
