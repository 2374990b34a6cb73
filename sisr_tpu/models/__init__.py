from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config
from sisr_tpu.models.discriminator import UNetDiscriminatorSN, SNConv
from sisr_tpu.models.vgg import VGGFeatures, PerceptualLoss, LPIPSVgg
from sisr_tpu.models.torch_port import convert_hit_sir_state_dict, load_torch_checkpoint
from sisr_tpu.models.unet_sr import UNetSR
from sisr_tpu.models.dense_sr import DenseSR
