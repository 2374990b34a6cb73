from sisr_tpu.ops.pallas.dwconv import dwconv5x5, depthwise_conv_reference
