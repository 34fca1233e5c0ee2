from .checkpoint import latest_epoch, restore_checkpoint, restore_params, save_checkpoint
from .logging import RunLogger, format_report

__all__ = [
    "latest_epoch",
    "restore_checkpoint",
    "restore_params",
    "save_checkpoint",
    "RunLogger",
    "format_report",
]
