#!/usr/bin/env python
"""Entry point mirroring the reference's `python train_fusion.py` usage."""
from mode_tpu.cli.train_fusion import main

if __name__ == "__main__":
  main()
