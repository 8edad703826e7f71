from .schedule import warmup_cosine_lr, make_epoch_schedule
