from puzzlelib_tpu.converter.engine.buildengine import buildEngine, DataType
from puzzlelib_tpu.converter.engine.engine import Engine
from puzzlelib_tpu.converter.engine.datacalibrator import DataCalibrator
