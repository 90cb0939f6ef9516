"""Shim for diffusers.models.resnet with the 0.18 parameter layouts.

The module/parameter names here (norm1/conv1/time_emb_proj/norm2/conv2/
conv_shortcut, downsamplers' `conv`, upsamplers' `conv`) are the checkpoint
contract for every diffusers-format SD UNet — reproduced exactly so
state_dict() of the vendored UNet enumerates the real keys/shapes.
Forwards implement the standard residual computation (enough for a smoke
forward; manifest generation only needs __init__).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock2D(nn.Module):
    def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                 dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                 pre_norm=True, eps=1e-6, non_linearity="silu",
                 time_embedding_norm="default", output_scale_factor=1.0,
                 use_in_shortcut=None, up=False, down=False,
                 skip_time_act=False, kernel=None):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        groups_out = groups if groups_out is None else groups_out
        self.time_embedding_norm = time_embedding_norm
        self.output_scale_factor = output_scale_factor

        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        if temb_channels is not None:
            if time_embedding_norm == "default":
                self.time_emb_proj = nn.Linear(temb_channels, out_channels)
            elif time_embedding_norm == "scale_shift":
                self.time_emb_proj = nn.Linear(temb_channels, 2 * out_channels)
            else:
                raise ValueError(time_embedding_norm)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups_out, out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = nn.SiLU()

        self.use_in_shortcut = (
            in_channels != out_channels if use_in_shortcut is None else use_in_shortcut
        )
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1) if self.use_in_shortcut else None
        )

    def forward(self, input_tensor, temb):
        h = self.conv1(self.nonlinearity(self.norm1(input_tensor)))
        if self.time_emb_proj is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
            if self.time_embedding_norm == "default":
                h = h + temb
        h = self.conv2(self.dropout(self.nonlinearity(self.norm2(h))))
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + h) / self.output_scale_factor


class Downsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None, padding=1,
                 name="conv"):
        super().__init__()
        out_channels = out_channels or channels
        self.padding = padding
        if use_conv:
            conv = nn.Conv2d(channels, out_channels, 3, stride=2, padding=padding)
        else:
            conv = nn.AvgPool2d(kernel_size=2, stride=2)
        # diffusers registers the UNet's name="op" downsampler as `conv` in
        # the state dict (down_blocks.*.downsamplers.0.conv.*).
        self.conv = conv

    def forward(self, hidden_states):
        if self.padding == 0:
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1))
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv"):
        super().__init__()
        out_channels = out_channels or channels
        if use_conv_transpose:
            self.conv = nn.ConvTranspose2d(channels, out_channels, 4, 2, 1)
        elif use_conv:
            self.conv = nn.Conv2d(channels, out_channels, 3, padding=1)
        else:
            self.conv = None

    def forward(self, hidden_states, output_size=None):
        hidden_states = F.interpolate(hidden_states, scale_factor=2.0,
                                      mode="nearest")
        if self.conv is not None:
            hidden_states = self.conv(hidden_states)
        return hidden_states


def __getattr__(name):
    raise AttributeError(
        f"diffusers shim: {name} not provided (not needed for SD manifests)")
