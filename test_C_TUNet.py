#!/usr/bin/env python
"""Evaluate a single CUNet/TUNet checkpoint — TPU-native equivalent of the
reference test_C_TUNet.py."""
from hybrid_ctunet_tpu.cli.test_main import test_single

if __name__ == "__main__":
    test_single()
