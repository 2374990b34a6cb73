from sisr_tpu.ops.resize import imresize_matlab, imresize_matlab_np, nearest_upsample, bilinear_resize
from sisr_tpu.ops.color import rgb_to_y, normalize_rgb, denormalize_rgb, IMAGENET_ISH_RGB_MEAN
from sisr_tpu.ops.windows import window_partition, window_reverse, pad_to_multiple
from sisr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from sisr_tpu.ops.metrics import psnr, ssim
