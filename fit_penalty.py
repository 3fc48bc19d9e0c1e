#!/usr/bin/env python
"""GMM penalty fitting entry point (reference: train_penalty_em.py)."""
from arflow_tpu.cli import fit_penalty_cli

if __name__ == "__main__":
    fit_penalty_cli()
