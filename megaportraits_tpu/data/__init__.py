from megaportraits_tpu.data.dataset import EMODataset
from megaportraits_tpu.data.prefetch import prefetch_to_device
