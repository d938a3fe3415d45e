"""barcoder_tpu.pipeline"""
