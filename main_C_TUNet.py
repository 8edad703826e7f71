#!/usr/bin/env python
"""Train CUNet or TUNet (select with --model_name=cunet|tunet) — the
TPU-native equivalent of the reference main_C_TUNet.py entry point."""
from hybrid_ctunet_tpu.cli.train_main import main

if __name__ == "__main__":
    main("c_tunet")
