from saragan_tpu.optim.factory import make_optimizer  # noqa: F401
from saragan_tpu.optim.schedules import lr_schedule, scale_lr  # noqa: F401
from saragan_tpu.optim.ema import ema_init, ema_update, fold_ema  # noqa: F401
from saragan_tpu.optim.freeze import apply_freeze_names, freeze_select  # noqa: F401
