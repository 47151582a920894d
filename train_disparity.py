#!/usr/bin/env python
"""Entry point mirroring the reference's `python train_disparity.py` usage."""
from mode_tpu.cli.train_disparity import main

if __name__ == "__main__":
  main()
