"""CLI layer — reproduces the reference's argparse flag surface
(main_C_TUNet.py:33-98, main_CTUNet.py:30-95, test_*.py) over the TPU-native
stack. Flags that only configured CUDA/DDP mechanics (``--dist-backend``,
``--noamp``, ``--workers``...) are accepted for compatibility and mapped to
their TPU equivalents or ignored with a note."""
from .args import build_train_parser, build_test_parser

__all__ = ["build_train_parser", "build_test_parser"]
