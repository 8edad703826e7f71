"""Evaluation & postprocessing — per-organ Dice/HD95 metrics, nnU-Net-style
largest-connected-component postprocessing, and the dice.txt report writer
(capability match for reference test_CTUNet_final.py:83-401 and
test_CTUNet.py:219-326)."""
from .metrics import (
    BTCV_ORGANS,
    process_label,
    dice_score,
    hd95,
    per_organ_dice,
    per_organ_hd95,
    com_dice,
    com_hd,
)
from .postprocess import (
    remove_all_but_largest_component,
    determine_postprocessing,
)
from .report import write_dice_report

__all__ = [
    "BTCV_ORGANS",
    "process_label",
    "dice_score",
    "hd95",
    "per_organ_dice",
    "per_organ_hd95",
    "com_dice",
    "com_hd",
    "remove_all_but_largest_component",
    "determine_postprocessing",
    "write_dice_report",
]
