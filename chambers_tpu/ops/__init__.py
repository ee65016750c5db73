from chambers_tpu.ops import image_ops
