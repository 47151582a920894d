#!/usr/bin/env python
"""Entry point mirroring the reference's `python save_output_disparity_stage.py` usage."""
from mode_tpu.cli.save_output_disparity_stage import main

if __name__ == "__main__":
  main()
