from sisr_tpu.train.losses import l1_loss, mse_loss, charbonnier_loss, gan_loss
