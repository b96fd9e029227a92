"""Logging configuration (reference ``utils/logging_utils.py``).

Root-logger setup, per-experiment file handler and environment/version
stamping, with JAX/XLA info replacing the torch version lines.
"""

from __future__ import annotations

import logging
import subprocess

_FORMAT = "%(asctime)s - %(levelname)s - %(message)s"


def config_logger(log_level: int = logging.INFO) -> None:
    # force: environments that import jax/absl before us already attached a
    # root handler at WARNING; replace it or INFO logs vanish
    logging.basicConfig(format=_FORMAT, level=log_level, force=True)


def log_to_file(
    logger_name: str | None = None,
    log_level: int = logging.INFO,
    log_filename: str = "tmp.log",
) -> None:
    logger = logging.getLogger(logger_name)
    fh = logging.FileHandler(log_filename)
    fh.setLevel(log_level)
    fh.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(fh)


def log_versions() -> None:
    import jax

    try:
        branch = subprocess.check_output(
            ["git", "rev-parse", "--abbrev-ref", "HEAD"], stderr=subprocess.DEVNULL
        ).strip()
        commit = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
        ).strip()
        logging.info("--------------- Versions ---------------")
        logging.info("git branch: %s", str(branch))
        logging.info("git hash: %s", str(commit))
    except (subprocess.CalledProcessError, FileNotFoundError):
        logging.info("--------------- Versions ---------------")
    logging.info("jax: %s", jax.__version__)
    logging.info("backend: %s", jax.default_backend())
    logging.info("devices: %s", jax.device_count())
    logging.info("----------------------------------------")
