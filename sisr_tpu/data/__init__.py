from sisr_tpu.data.transforms import ImageTransforms, augment, draw_augment_params, convert_image
from sisr_tpu.data.degradation import degradation_bsrgan
from sisr_tpu.data.dataset import SRDataset, DataLoader
