from .checkpoint import (
    AsyncCheckpointSaver,
    latest_epoch,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from .logging import RunLogger, format_report

__all__ = [
    "AsyncCheckpointSaver",
    "latest_epoch",
    "restore_checkpoint",
    "restore_params",
    "save_checkpoint",
    "RunLogger",
    "format_report",
]
