from puzzlelib_tpu.converter.engine.buildengine import buildEngine
from puzzlelib_tpu.converter.engine.engine import Engine
