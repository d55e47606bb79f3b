from megaportraits_tpu.utils.image import save_image
from megaportraits_tpu.utils.logging import MetricsWriter
