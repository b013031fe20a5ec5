#!/usr/bin/env python3
"""Root-level shim matching the reference entry point `python convert.py ...`."""
from gaussmart_tpu.convert import main

if __name__ == "__main__":
    main()
