"""Quantization subsystem (reference `srt/layers/quantization/`, SURVEY §2 Q).

Runtime quantized-linear methods live in `layers/linear.py` (the
LinearMethod family); this package handles pre-quantized checkpoint
ingestion (AWQ / GPTQ int4 packing) and quantization utilities.
"""
