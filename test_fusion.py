#!/usr/bin/env python
"""Entry point mirroring the reference's `python test_fusion.py` usage."""
from mode_tpu.cli.test_fusion import main

if __name__ == "__main__":
  main()
