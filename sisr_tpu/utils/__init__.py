from sisr_tpu.utils.meters import AverageMeter, format_str
