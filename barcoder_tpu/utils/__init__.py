"""barcoder_tpu.utils"""
