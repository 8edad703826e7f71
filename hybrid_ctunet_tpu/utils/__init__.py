"""Utilities: torch checkpoint import, scalar logging, profiling, caches."""
from .logging import AverageMeter, ScalarWriter
from .profiling import StepTimer, enable_nan_checks, trace
from .compilation_cache import enable as enable_compilation_cache

__all__ = [
    "AverageMeter",
    "ScalarWriter",
    "StepTimer",
    "enable_nan_checks",
    "trace",
    "enable_compilation_cache",
]
