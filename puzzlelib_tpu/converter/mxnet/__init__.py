from puzzlelib_tpu.converter.mxnet.convertmodel import convert, readHeader, readData, readKeys, buildHdf
