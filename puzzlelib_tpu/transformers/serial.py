"""Single-dataset circular chunk provider (reference: /root/reference/Transformers/Serial.py)."""

import numpy as np

from puzzlelib_tpu.transformers.provider import Provider


class Serial(Provider):
    def __init__(self, dataset, labels=None, numofthreads=4):
        super().__init__(numofthreads)

        self.datalen = dataset.shape[0]
        self.labels = labels
        self.dataset = dataset
        self.index = 0

    def getNextChunk(self, chunksize, **kwargs):
        if chunksize >= self.datalen:
            self.index = 0

            if self.labels is not None:
                return np.array(self.dataset), np.array(self.labels)

            return np.array(self.dataset)

        begin = self.index
        end = self.index + chunksize

        if end > self.datalen:
            chunk = np.empty((chunksize, ) + self.dataset.shape[1:], dtype=self.dataset.dtype)
            chunk[:self.datalen - begin] = self.dataset[begin:self.datalen]

            self.index = end - self.datalen
            chunk[self.datalen - begin:] = self.dataset[:self.index]

            if self.labels is not None:
                labels = np.empty((chunksize, ), dtype=self.labels.dtype)
                labels[:self.datalen - begin] = self.labels[begin:self.datalen]
                labels[self.datalen - begin:] = self.labels[:self.index]

                return chunk, labels

            return chunk

        self.index = end
        chunk = np.array(self.dataset[begin:end])

        if self.labels is not None:
            return chunk, np.array(self.labels[begin:end])

        return chunk
