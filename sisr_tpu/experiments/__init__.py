from sisr_tpu.experiments.experiment import Experiment
from sisr_tpu.experiments.hitsir_pro_experiment import HITSIRPROExperiment, hitsir_pro_experiment
from sisr_tpu.experiments.hitsir_pro_gan_experiment import (
    HITSIRPROGANExperiment, hitsir_pro_gan_experiment)
