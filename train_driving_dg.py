#!/usr/bin/env python3
"""Top-level experiment driver — same entry point name and flags as the
reference train_driving_dg.py. Example:

  python3 train_driving_dg.py --model FRCNN --exp dg --source_domains AC \
      --target_domains A --weights_folder AC2A --weights_file ac2a_dgfrcnn \
      --reg_weights 0.5 0.5 0.5 0.05 0.0001
"""
from dgod_tpu.cli import main

if __name__ == "__main__":
    main()
