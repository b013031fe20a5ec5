#!/usr/bin/env python3
"""Root-level shim matching the reference entry point `python metrics.py ...`."""
from gaussmart_tpu.eval.metrics_cli import main

if __name__ == "__main__":
    main()
