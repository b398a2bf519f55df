"""Command-line entry points.

* ``python -m quantizers_tpu.cli.do_oneshot`` — calibrated quantization
  (reference ``scripts/do_oneshot.py``)
* ``python -m quantizers_tpu.cli.model_free`` — data-free PTQ
  (reference ``scripts/quant_GLM-4.7-Flash-FP8.py``)
* ``python -m quantizers_tpu.cli.recombine`` — mixed-precision weight
  surgery (reference ``scripts/recombine_weights_MiniMax-M2.1.py``)
* ``python -m quantizers_tpu.cli.validate_config`` — quantization_config
  schema check (reference ``scripts/quant_config_debug.py``)
* ``python -m quantizers_tpu.cli.make_tiny_model`` — write a tiny local HF
  checkpoint for offline smoke runs
"""
