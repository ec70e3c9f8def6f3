from puzzlelib_tpu.converter.caffe.convertmodel import convert, loadNetParameter, js2hdf
