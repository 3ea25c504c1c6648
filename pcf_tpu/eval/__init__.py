from pcf_tpu.eval.io import write_ply_color, write_labels_txt, NYU40_COLORMAP, remap_20_to_nyu40
