"""CLI entry points: preprocess / train / tune / synth / evaluate.

Replaces the reference's main.py:261-369 + preprocess.py:81-103 argparse
surface. Usage: python -m fscl_tpu.cli <command> [...].
"""
