from megaportraits_tpu.core.dtypes import Policy, DEFAULT_POLICY, FP32_POLICY
from megaportraits_tpu.core.config import Config, load_config
