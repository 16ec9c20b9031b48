"""Command-line tools: encode, view, benchmark.

Run as ``python -m tinyimgcodec_tpu.cli.encode`` etc.  Counterparts of the
reference's top-level scripts (encode.py, viewer.py, tests/benchmark.py,
tests/figure.py).
"""
