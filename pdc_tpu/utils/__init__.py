from pdc_tpu.utils.constants import DEPTH_IM_SCALE, DEFAULT_IMAGE_MEAN, DEFAULT_IMAGE_STD
from pdc_tpu.utils.yaml_io import load_yaml, save_yaml
