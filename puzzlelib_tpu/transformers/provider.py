"""Threaded async data pipeline base (reference: /root/reference/Transformers/Provider.py).

``prepareData`` launches augmentation in a thread pool while the TPU trains on
the previous chunk; ``getData`` joins and reassembles.
"""

from multiprocessing.pool import ThreadPool

import numpy as np


class Provider:
    def __init__(self, numofthreads=4):
        self.transformers = []
        self.numofthreads = numofthreads

        self.pool = ThreadPool(numofthreads)
        self.poolresults = None
        self.data = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.closePool()

    def closePool(self):
        self.pool.close()
        self.pool.join()

    def addTransformer(self, transformer):
        self.transformers.append(transformer)

    def getNextChunk(self, chunksize, **kwargs):
        raise NotImplementedError()

    def prepareData(self, chunksize=20000, **kwargs):
        result = self.getNextChunk(chunksize, **kwargs)

        if len(self.transformers) == 0:
            self.data = result
            return

        isMulti = isinstance(result, (tuple, list))

        if result is not None:
            size = result[0].shape[0] if isMulti else result.shape[0]
            batchsize = size // self.numofthreads

            batches = []
            for i in range(self.numofthreads):
                begin = i * batchsize
                end = begin + batchsize if i < self.numofthreads - 1 else size

                if isMulti:
                    batches.append([res[begin:end] for res in result])
                else:
                    batches.append(result[begin:end])

            args = [(self.transformers, batch, i) for i, batch in enumerate(batches)]
        else:
            args = [(self.transformers, None, i) for i in range(self.numofthreads)]

        self.poolresults = self.pool.starmap_async(self.worker, args)

    def getData(self):
        if self.poolresults is not None:
            self.poolresults.wait()

            results = [None] * self.numofthreads
            for result, threadidx in self.poolresults.get():
                results[threadidx] = result

            self.poolresults = None

            if isinstance(results[0], (tuple, list)):
                length = sum(res[0].shape[0] for res in results)

                self.data = tuple(
                    np.empty((length, ) + results[0][i].shape[1:], dtype=results[0][i].dtype)
                    for i in range(len(results[0]))
                )

                idx = 0
                for res in results:
                    for i, dat in enumerate(res):
                        self.data[i][idx:idx + dat.shape[0]] = dat
                    idx += res[0].shape[0]

            else:
                length = sum(res.shape[0] for res in results)
                self.data = np.empty((length, ) + results[0].shape[1:], dtype=np.float32)

                idx = 0
                for res in results:
                    self.data[idx:idx + res.shape[0]] = res
                    idx += res.shape[0]

        return self.data

    @staticmethod
    def worker(transformers, batch, threadidx):
        for transformer in transformers:
            batch = transformer(batch, threadidx)

        return batch, threadidx
