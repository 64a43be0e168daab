"""Misc logging / tree utilities (llava/utils.py parity, TPU-native).

- build_logger: rotating file log + stdout/stderr capture (utils.py:18-58)
- disable_torch_init has no JAX analogue (params are built explicitly);
  the closest concern — avoiding double init when restoring weights — is
  handled by the converters loading into pre-built trees.
- tree_to: recursive device/dtype move over arbitrary containers, the JAX
  counterpart of torch_to (utils.py:130-145)."""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from typing import Any, Optional

LOGDIR = os.environ.get("VIDEONET_LOG_DIR", "logs")

_handler: Optional[logging.Handler] = None


class StreamToLogger:
    """File-like object that redirects writes to a logger
    (utils.py:61-91)."""

    def __init__(self, logger: logging.Logger, log_level=logging.INFO):
        self.terminal = sys.stdout
        self.logger = logger
        self.log_level = log_level
        self.linebuf = ""

    def __getattr__(self, attr):
        return getattr(self.terminal, attr)

    def write(self, buf):
        temp_linebuf = self.linebuf + buf
        self.linebuf = ""
        for line in temp_linebuf.splitlines(True):
            if line[-1] == "\n":
                self.logger.log(self.log_level, line.rstrip())
            else:
                self.linebuf += line

    def flush(self):
        if self.linebuf != "":
            self.logger.log(self.log_level, self.linebuf.rstrip())
        self.linebuf = ""


def build_logger(logger_name: str, logger_filename: str,
                 redirect_streams: bool = True) -> logging.Logger:
    """Rotating daily file handler on every logger + optional stdout/stderr
    redirection (utils.py:18-58)."""
    global _handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")
    if not logging.getLogger().handlers:
        logging.basicConfig(level=logging.INFO)
    logging.getLogger().handlers[0].setFormatter(formatter)

    if redirect_streams:
        stdout_logger = logging.getLogger("stdout")
        stdout_logger.setLevel(logging.INFO)
        sys.stdout = StreamToLogger(stdout_logger, logging.INFO)
        stderr_logger = logging.getLogger("stderr")
        stderr_logger.setLevel(logging.ERROR)
        sys.stderr = StreamToLogger(stderr_logger, logging.ERROR)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)

    if _handler is None:
        os.makedirs(LOGDIR, exist_ok=True)
        _handler = logging.handlers.TimedRotatingFileHandler(
            os.path.join(LOGDIR, logger_filename), when="D", utc=True,
            encoding="UTF-8")
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)
    return logger


def tree_to(x: Any, device=None, dtype=None,
            raise_error_if_unknown: bool = False) -> Any:
    """Recursively move arrays in lists/tuples/dicts to a device and/or
    dtype (torch_to parity, utils.py:130-145)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if isinstance(x, (jax.Array, np.ndarray)):
        y = jnp.asarray(x, dtype) if dtype is not None else jnp.asarray(x)
        return jax.device_put(y, device) if device is not None else y
    if isinstance(x, (list, tuple)):
        return type(x)(tree_to(e, device, dtype, raise_error_if_unknown)
                       for e in x)
    if isinstance(x, dict):
        return {k: tree_to(v, device, dtype, raise_error_if_unknown)
                for k, v in x.items()}
    if raise_error_if_unknown:
        raise ValueError(f"Unable to apply 'tree_to' to type {type(x)}")
    return x
