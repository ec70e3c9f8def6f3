"""Reference: /root/reference/Transformers/Transformer.py."""


class Transformer:
    def __call__(self, batch, threadidx):
        return batch
