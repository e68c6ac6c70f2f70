"""Logging (`deeplabv3plus/lib/utils/log.py`): a named logger with optional
per-run file handlers, and a tqdm->logger bridge."""

import io
import logging

logger = logging.getLogger("gan_segmentation_tpu")
logger.setLevel(logging.INFO)
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("(%(levelname)s) %(asctime)s: %(message)s",
                                      datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(_h)


def add_file_handler(path):
    fh = logging.FileHandler(str(path))
    fh.setFormatter(logging.Formatter(
        "(%(levelname)s) %(asctime)s: %(message)s", datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(fh)
    return fh


class TqdmToLogger(io.StringIO):
    """Redirect tqdm output into the logger (`log.py:14-35`)."""

    def __init__(self, target_logger=None, level=logging.INFO, mininterval=5):
        super().__init__()
        self.logger = target_logger or logger
        self.level = level
        self.mininterval = mininterval
        self._last = 0
        self.buf = ""

    def write(self, buf):
        self.buf = buf.strip("\r\n\t ")

    def flush(self):
        import time
        if len(self.buf) > 0 and time.time() - self._last > self.mininterval:
            self.logger.log(self.level, self.buf)
            self._last = time.time()
