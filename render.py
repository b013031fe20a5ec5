#!/usr/bin/env python3
"""Root-level shim matching the reference entry point `python render.py ...`."""
from gaussmart_tpu.render_cli import main

if __name__ == "__main__":
    main()
