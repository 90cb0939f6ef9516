"""Shim for diffusers.models.embeddings.

TimestepEmbedding reproduces the diffusers-0.18 parameter layout exactly
(linear_1/linear_2[/cond_proj]) — those names are part of the checkpoint
contract. The remaining classes are imported by the vendored files but never
instantiated for SD/GLIGEN configs; they raise if constructed.
"""

import torch.nn as nn


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                 out_dim=None, post_act_fn=None, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        if cond_proj_dim is not None:
            self.cond_proj = nn.Linear(cond_proj_dim, in_channels, bias=False)
        else:
            self.cond_proj = None
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)
        self.post_act = None if post_act_fn is None else nn.SiLU()

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        sample = self.linear_2(self.act(self.linear_1(sample)))
        if self.post_act is not None:
            sample = self.post_act(sample)
        return sample


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        # diffusers get_timestep_embedding (0.18), scale=1, max_period=1e4.
        import math

        import torch

        half = self.num_channels // 2
        exponent = -math.log(10000.0) * torch.arange(
            half, dtype=torch.float32, device=timesteps.device)
        exponent = exponent / (half - self.downscale_freq_shift)
        emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if self.flip_sin_to_cos:
            emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
        return emb


class _NeverInstantiated(nn.Module):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"{type(self).__name__} is not used by SD/GLIGEN configs; the "
            "shim provides it only so the vendored import succeeds.")


class GaussianFourierProjection(_NeverInstantiated):
    pass


class TextImageProjection(_NeverInstantiated):
    pass


class TextImageTimeEmbedding(_NeverInstantiated):
    pass


class TextTimeEmbedding(_NeverInstantiated):
    pass


class CombinedTimestepLabelEmbeddings(_NeverInstantiated):
    pass


class ImagePositionalEmbeddings(_NeverInstantiated):
    pass


class PatchEmbed(_NeverInstantiated):
    pass
