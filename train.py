#!/usr/bin/env python3
"""Root-level shim matching the reference entry point `python train.py ...`."""
from gaussmart_tpu.train import main

if __name__ == "__main__":
    main()
