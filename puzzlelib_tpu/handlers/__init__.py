"""Handler exports (parity with /root/reference/Handlers/__init__.py)."""

from puzzlelib_tpu.handlers.calculator import Calculator
from puzzlelib_tpu.handlers.trainer import Trainer
from puzzlelib_tpu.handlers.validator import Validator
from puzzlelib_tpu.handlers.handler import Handler
