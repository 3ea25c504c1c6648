from pcf_tpu.utils.logger import get_logger
