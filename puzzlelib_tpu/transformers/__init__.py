"""Async data augmentation pipeline (parity with /root/reference/Transformers/__init__.py)."""

from puzzlelib_tpu.transformers.provider import Provider
from puzzlelib_tpu.transformers.transformer import Transformer
from puzzlelib_tpu.transformers.serial import Serial
from puzzlelib_tpu.transformers.merger import Merger
from puzzlelib_tpu.transformers.generator import Generator
