"""Pure-generator provider (reference: /root/reference/Transformers/Generator.py)."""

from puzzlelib_tpu.transformers.provider import Provider


class Generator(Provider):
    def getNextChunk(self, chunksize, **kwargs):
        return None
