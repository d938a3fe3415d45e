"""barcoder_tpu.cli"""
