from .nifti import load_nifti, save_nifti
from .datalist import load_decathlon_datalist
from .transforms import (
    orientation_ras,
    spacing_resample,
    scale_intensity_range,
    crop_foreground,
    rand_crop_by_pos_neg_label,
    rand_flip,
    rand_rotate90,
    rand_scale_intensity,
    rand_shift_intensity,
    preprocess_case,
    invert_to_native,
)
from .dataset import CachedDataset, TrainLoader, ShardSampler
