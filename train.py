#!/usr/bin/env python
"""Training entry point (reference: train.py).

Usage: python train.py -c configs/chairs_uflow.json [-e] [-m ckpt]
"""
from arflow_tpu.cli import train_cli

if __name__ == "__main__":
    train_cli()
