"""Shim for diffusers.models.modeling_utils (structure-only)."""

import torch.nn as nn


class ModelMixin(nn.Module):
    @property
    def dtype(self):
        for p in self.parameters():
            return p.dtype
        import torch

        return torch.float32

    @property
    def device(self):
        for p in self.parameters():
            return p.device
        import torch

        return torch.device("cpu")
