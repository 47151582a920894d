#!/usr/bin/env python
"""Entry point mirroring the reference's `python predict.py` usage."""
from mode_tpu.cli.predict import main

if __name__ == "__main__":
  main()
