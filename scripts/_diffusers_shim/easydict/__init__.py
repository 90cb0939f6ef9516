"""Shim for the `easydict` package (reference models/models.py:5): a dict
with attribute access, sufficient for the reference's model_dict usage."""


class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in dict(d).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value
