from puzzlelib_tpu.passes.converttograph import toGraph, ConverterError
