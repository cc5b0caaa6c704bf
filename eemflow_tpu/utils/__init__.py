from eemflow_tpu.utils.logger import Logger
from eemflow_tpu.utils.config import load_config, create_save_path
