#!/usr/bin/env python
"""Offline evaluation of dumped .flo/.npy files
(reference: evaluate_flo_files_sintel.py)."""
from arflow_tpu.cli import evaluate_flo_cli

if __name__ == "__main__":
    evaluate_flo_cli()
