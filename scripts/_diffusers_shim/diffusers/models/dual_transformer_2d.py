"""Shim: DualTransformer2DModel is never used by SD/GLIGEN configs."""

import torch.nn as nn


class DualTransformer2DModel(nn.Module):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "DualTransformer2DModel is not used by SD/GLIGEN configs; the "
            "shim provides it only so the vendored import succeeds.")
