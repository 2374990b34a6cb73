"""HiT-SIR-Pro GAN fine-tune experiment.

Parity with reference experiments/hitsir_pro_gan_experiment.py:15-279:
  * UNet-SN discriminator with its own Adam + cosine schedule + checkpoint
    (``discriminator_new_epoch_model.pth``; its start_epoch drives resume)
  * G step: pixel + 1.0 * VGG19-perceptual + 0.1 * adversarial BCE
  * D step: BCE(real) + BCE(fake-detached), one optimizer step
  * the generator optimizer is NOT loaded on the first GAN epoch (the G
    weights are pre-seeded from a PSNR run as new_epoch_model.pth)

Both optimizer updates run inside one jit-compiled step
(sisr_tpu.train.train_state.make_gan_train_step).
"""

from __future__ import annotations

import copy
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sisr_tpu.configs.dataset_config import DatasetConfig
from sisr_tpu.configs.hit_model_config import HITModelConfig
from sisr_tpu.experiments.hitsir_pro_experiment import HITSIRPROExperiment
from sisr_tpu.models.discriminator import UNetDiscriminatorSN
from sisr_tpu.models.vgg import PerceptualLoss
from sisr_tpu.configs.model_config import get_optimizer, get_scheduler
from sisr_tpu.train import checkpoint as ckpt
from sisr_tpu.train.train_state import (GANTrainState, TrainState,
                                        create_train_state, make_gan_train_step,
                                        set_learning_rate)
from sisr_tpu.utils.meters import AverageMeter, format_str


def load_perceptual_variables(path: Optional[str]):
    """Converted VGG19-features variables for the GAN perceptual loss, or
    None (→ random init) with a LOUD warning: a real GAN run against a
    random-init VGG19 silently optimizes noise features."""
    if path and os.path.exists(path):
        from flax import serialization
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    import warnings
    warnings.warn(
        "GAN perceptual loss is using a RANDOM-INIT VGG19 (no "
        "perceptual_weights_path given or file missing). Training quality "
        "will be meaningless; convert pretrained weights with "
        "tools/convert_vgg.py perceptual vgg19.pth out.msgpack",
        stacklevel=2)
    return None


class HITSIRPROGANExperiment(HITSIRPROExperiment):
    gan_mode = True

    def __init__(self, *args, perceptual_weights_path: Optional[str] = None,
                 **kwargs):
        self._perceptual_weights_path = perceptual_weights_path
        super().__init__(*args, **kwargs)

    def init_model(self):
        super().init_model()
        crop = self.train_data_config.crop_size
        scale = self.model_config.scaling_factor
        self.discriminator = UNetDiscriminatorSN()
        d_vars = self.discriminator.init(
            jax.random.PRNGKey(1), jnp.zeros((1, crop * scale, crop * scale, 3)))
        self.d_params = d_vars["params"]
        self.d_collections = {"spectral": d_vars["spectral"]}

    def init_tools(self):
        super().init_tools()
        self.epoch_discriminator_loss = AverageMeter()

    def init_optimizer_loss_function(self):
        super().init_optimizer_loss_function()
        mc = self.model_config
        self.d_tx = get_optimizer(mc.optimizer, mc.learning_rate, mc.optimizer_params)
        self.d_state = self._place_state(create_train_state(self.d_params, self.d_tx))

        variables = load_perceptual_variables(self._perceptual_weights_path)
        self.f_loss_function = PerceptualLoss(variables=variables)
        self.f_loss_function_weight = 1.0
        self.d_loss_function_weight = 0.1

        def d_apply(variables, x, update_stats=False, mutable=None):
            if mutable:
                return self.discriminator.apply(variables, x, update_stats,
                                                mutable=mutable)
            return self.discriminator.apply(variables, x, update_stats), {
                "spectral": variables["spectral"]}

        self.gan_step = make_gan_train_step(
            g_apply=self._train_apply,
            d_apply=d_apply,
            pixel_loss=self.loss_function,
            perceptual_loss=self.f_loss_function,
            g_tx=self.tx,
            d_tx=self.d_tx,
            perceptual_weight=self.f_loss_function_weight,
            adversarial_weight=self.d_loss_function_weight,
        )

    def load_model_weights_scheduler(self, is_gan_start: bool = False):
        self.discriminator_pretrain_model_path = os.path.join(
            self.model_config.checkpoint_folder, "discriminator_new_epoch_model.pth")
        if os.path.exists(self.discriminator_pretrain_model_path):
            loaded = ckpt.load_checkpoint(
                self.discriminator_pretrain_model_path,
                self.d_state.params, self.d_state.opt_state)
            self.d_state = self._place_state(TrainState(
                loaded["model"],
                loaded["optimizer"] if loaded["optimizer"] is not None
                else self.d_state.opt_state))
            if loaded["extra"].get("spectral"):
                # restore power-iteration u/v so sigma estimates survive
                # resume (torch persists weight_u/weight_v in the state_dict)
                from flax import serialization
                self.d_collections = {"spectral": serialization.from_state_dict(
                    self.d_collections["spectral"], loaded["extra"]["spectral"])}
            self.start_epoch = loaded["start_epoch"] + 1
            print(f"loaded discriminator, trained epochs: {self.start_epoch - 1}")
        super().load_model_weights_scheduler(is_gan_start=self.start_epoch == 1)
        self.d_state = TrainState(
            self.d_state.params,
            set_learning_rate(self.d_state.opt_state, self.current_lr()))

    def _sync_epoch_lr(self):
        super()._sync_epoch_lr()
        if getattr(self, "d_state", None) is not None:
            self.d_state = TrainState(
                self.d_state.params,
                set_learning_rate(self.d_state.opt_state, self.current_lr()))

    def train_batch(self, lr_imgs: np.ndarray, hr_imgs: np.ndarray):
        self._rng, step_rng = jax.random.split(self._rng)
        lr_imgs, hr_imgs = self._place_batch(lr_imgs, hr_imgs)
        state = GANTrainState(g=self.state, d=self.d_state,
                              d_variables=self.d_collections)
        state, g_loss, d_loss = self.gan_step(
            state, lr_imgs, hr_imgs, step_rng)
        self.state = state.g
        self.d_state = state.d
        self.d_collections = state.d_variables
        self.epoch_loss.update(float(g_loss), len(hr_imgs))
        self.epoch_discriminator_loss.update(float(d_loss), len(hr_imgs))

    def train(self):
        self.epoch_discriminator_loss.reset()
        super().train()

    def train_dataloader_process(self):
        super().train_dataloader_process()
        ckpt.save_checkpoint(
            self.discriminator_pretrain_model_path, self.start_epoch,
            self.d_state.params, self.d_state.opt_state,
            extra={"spectral": self.d_collections["spectral"]})
        self.loss_log[-1].append(f"d_loss:{self.epoch_discriminator_loss.avg}")
        self.lr_log[-1] = (
            f"epoch:{self.start_epoch + 1},"
            f"lr:{format_str(self.lr_schedule(self.start_epoch), 25)}, "
            f"discriminator_lr:{format_str(self.lr_schedule(self.start_epoch), 25)}")
        self._write_rows(self.loss_log_path, self.loss_log)
        self._write_rows(self.lr_log_path, [[row] for row in self.lr_log])


def hitsir_pro_gan_experiment(
    is_test: bool,
    loss: str,
    is_mult_size_conv_feat_extract: bool,
    is_channel_spatial_attn: bool,
    is_fusion: bool,
    epochs: int,
    is_augment,
    batch_size,
    test_model_name,
    embed_dim,
    base_win_size,
    depths,
    num_heads,
    mlp_ratio,
    upsampler,
    hier_win_ratios,
    data_root: str = "data",
    train_data_name_list=None,
    eval_data_name_list=None,
    test_data_name_list=None,
    loader_workers: int = 2,
    loader_worker_type: str = "process",
    run: bool = True,
    **extra,
):
    train_data_config = DatasetConfig(
        split="train", crop_size=64, scaling_factor=4,
        lr_img_type="[0,1]", hr_img_type="[0,1]",
        is_lr_amplify=False, is_augment=is_augment)
    eval_data_config = copy.deepcopy(train_data_config)
    eval_data_config.split = "eval|test"
    test_data_config = copy.deepcopy(train_data_config)
    test_data_config.split = "eval|test"

    folder_name = (f"hitsir_pro_gan_loss({loss})_mulsizeconvextract"
                   f"({is_mult_size_conv_feat_extract})_casa({is_channel_spatial_attn})"
                   f"{'_fusion' if is_fusion else ''}_embed_dim({embed_dim})"
                   f"_len(depths)({len(depths)})")
    if is_augment:
        folder_name += "_augment"

    model_config = HITModelConfig(
        batch_size=batch_size,
        learning_rate=2e-5,
        min_learning_rate=1e-7,
        optimizer="Adam",
        optimizer_params={"weight_decay": 0, "betas": [0.9, 0.99]},
        loss_function=loss,
        epochs=epochs,
        checkpoint_folder=f"weights/{folder_name}",
        test_model_path=f"weights/{folder_name}/{test_model_name}",
        result_folder=f"results/{folder_name}",
        log_folder=f"logs/{folder_name}",
        train_data_folder=f"{data_root}/train",
        train_data_name_list=train_data_name_list or [
            "RealSR(V3)", "DIV2K_train_HR", "wuthering_wave", "Flickr2K_HR", "blend"],
        eval_data_folder=f"{data_root}/eval",
        eval_data_name_list=eval_data_name_list or ["DIV2K_valid_HR30"],
        test_data_folder=f"{data_root}/test",
        test_data_name_list=test_data_name_list or ["Set5"],
        is_mult_size_conv_feat_extract=is_mult_size_conv_feat_extract,
        is_channel_spatial_attn=is_channel_spatial_attn,
        is_fusion=is_fusion,
        in_channel=3,
        embed_dim=embed_dim,
        base_win_size=base_win_size,
        depths=depths,
        num_heads=num_heads,
        mlp_ratio=mlp_ratio,
        upsampler=upsampler,
        hier_win_ratios=hier_win_ratios,
        loader_workers=loader_workers,
        loader_worker_type=loader_worker_type,
    )

    experiment = HITSIRPROGANExperiment(
        train_data_config=train_data_config,
        eval_data_config=eval_data_config,
        test_data_config=test_data_config,
        model_config=model_config,
        is_test=is_test,
        **extra,
    )
    if run:
        experiment.run()
    return experiment
