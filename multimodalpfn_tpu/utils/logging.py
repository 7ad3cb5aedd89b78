"""Logging configuration (console + rotating file), mirroring the reference's
dictConfig setup (`scripts_finetune_mm/finetune_mmpfn_main.py:41-68`, which logs
to ./logs/finetune_tabpfn.log)."""

from __future__ import annotations

import logging
import logging.config
from pathlib import Path


def setup_logging(
    *,
    level: int = logging.INFO,
    log_file: str | Path | None = "logs/finetune_mmpfn.log",
    name: str = "multimodalpfn_tpu",
) -> logging.Logger:
    handlers: dict = {
        "console": {
            "class": "logging.StreamHandler",
            "formatter": "standard",
            "level": level,
        }
    }
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        handlers["file"] = {
            "class": "logging.FileHandler",
            "filename": str(log_file),
            "formatter": "standard",
            "level": level,
        }
    logging.config.dictConfig(
        {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": {
                "standard": {
                    "format": "%(asctime)s [%(levelname)s] %(name)s: %(message)s"
                }
            },
            "handlers": handlers,
            "loggers": {
                name: {
                    "handlers": list(handlers),
                    "level": level,
                    "propagate": False,
                }
            },
        }
    )
    return logging.getLogger(name)
