#!/usr/bin/env python3
"""Root-level shim matching the reference entry point `python view.py ...`."""
from gaussmart_tpu.viewer.serve import main

if __name__ == "__main__":
    main()
