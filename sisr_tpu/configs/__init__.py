from sisr_tpu.configs.dataset_config import DatasetConfig
from sisr_tpu.configs.model_config import ModelConfig, get_optimizer, get_loss_function, get_scheduler
from sisr_tpu.configs.hit_model_config import HITModelConfig
from sisr_tpu.configs.unet_model_config import UNetModelConfig
from sisr_tpu.configs.dense_model_config import DenseModelConfig
