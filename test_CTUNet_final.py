#!/usr/bin/env python
"""Hybrid-CTUNet mask-complementation ensemble evaluation (CTUNet + TUNet,
Dice/HD95, largest-CC postprocessing) — TPU-native equivalent of the
reference test_CTUNet_final.py."""
from hybrid_ctunet_tpu.cli.test_main import test_final

if __name__ == "__main__":
    test_final()
