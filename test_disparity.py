#!/usr/bin/env python
"""Entry point mirroring the reference's `python test_disparity.py` usage."""
from mode_tpu.cli.test_disparity import main

if __name__ == "__main__":
  main()
