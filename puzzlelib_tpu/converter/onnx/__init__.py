from puzzlelib_tpu.converter.onnx.exporter import ONNXExporter
