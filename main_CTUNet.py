#!/usr/bin/env python
"""Train the joint dual-branch CTUNet — TPU-native equivalent of the
reference main_CTUNet.py entry point."""
from hybrid_ctunet_tpu.cli.train_main import main

if __name__ == "__main__":
    main("ctunet")
