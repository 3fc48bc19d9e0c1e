#!/usr/bin/env python
"""Inference entry point (reference: inference.py).

Usage: python inference.py -c cfg.json -m ckpt
Writes per-sample .flo flow and .npy entropy under data[i].out_root.
"""
from arflow_tpu.cli import inference_cli

if __name__ == "__main__":
    inference_cli()
