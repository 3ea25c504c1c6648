from pcf_tpu.models.backbone import PCF_Backbone
from pcf_tpu.models.segmentation import PointConvFormer_Segmentation
from pcf_tpu.models.zoo import PCF_Tiny, PCF_Small, PCF_Normal, PCF_Large
