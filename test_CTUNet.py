#!/usr/bin/env python
"""Three-checkpoint CTUNet evaluation — TPU-native equivalent of the
reference test_CTUNet.py."""
from hybrid_ctunet_tpu.cli.test_main import test_ctunet

if __name__ == "__main__":
    test_ctunet()
