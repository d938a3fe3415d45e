"""barcoder_tpu.parallel"""
