"""Minimal MONAI API stub so the *reference* networks (read-only at
/root/reference) can be instantiated under plain torch for golden-output and
parameter-count parity tests. Only the surface the reference imports is
provided (Convolution, UnetOutBlock, act/norm factories)."""
from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

REFERENCE_PATH = "/root/reference"


def _to_tuple(v, n=3):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v,) * n


class Convolution(nn.Sequential):
    def __init__(
        self,
        spatial_dims,
        in_channels,
        out_channels,
        strides=1,
        kernel_size=3,
        act=None,
        norm=None,
        dropout=None,
        groups=1,
        bias=True,
        conv_only=False,
        is_transposed=False,
        padding=None,
        output_padding=None,
    ):
        super().__init__()
        assert spatial_dims == 3
        if is_transposed:
            conv = nn.ConvTranspose3d(
                in_channels,
                out_channels,
                kernel_size=_to_tuple(kernel_size),
                stride=_to_tuple(strides),
                padding=_to_tuple(padding) if padding is not None else 0,
                output_padding=_to_tuple(output_padding) if output_padding is not None else 0,
                groups=groups,
                bias=bias,
            )
        else:
            conv = nn.Conv3d(
                in_channels,
                out_channels,
                kernel_size=_to_tuple(kernel_size),
                stride=_to_tuple(strides),
                padding=_to_tuple(padding) if padding is not None else 0,
                groups=groups,
                bias=bias,
            )
        self.add_module("conv", conv)
        assert conv_only, "stub only supports conv_only=True (all reference uses)"


class UnetOutBlock(nn.Module):
    def __init__(self, spatial_dims, in_channels, out_channels, dropout=None):
        super().__init__()
        self.conv = Convolution(
            spatial_dims, in_channels, out_channels, kernel_size=1, strides=1,
            bias=True, conv_only=True,
        )

    def forward(self, x):
        return self.conv(x)


def get_act_layer(name):
    if isinstance(name, tuple):
        kind, kwargs = name
    else:
        kind, kwargs = name, {}
    kind = str(kind).lower()
    if kind == "leakyrelu":
        return nn.LeakyReLU(
            negative_slope=kwargs.get("negative_slope", 0.01), inplace=kwargs.get("inplace", False)
        )
    raise NotImplementedError(kind)


def get_norm_layer(name, spatial_dims=3, channels=1):
    key = name[0] if isinstance(name, tuple) else name
    key = str(key).lower()
    if "instance" in key:
        return nn.InstanceNorm3d(channels)
    if "batch" in key:
        return nn.BatchNorm3d(channels)
    raise NotImplementedError(name)


def install():
    """Install the stub modules into sys.modules and put the reference on the
    path; returns the reference `networks` package."""
    if "monai" not in sys.modules:
        monai = types.ModuleType("monai")
        networks = types.ModuleType("monai.networks")
        blocks = types.ModuleType("monai.networks.blocks")
        dynunet_block = types.ModuleType("monai.networks.blocks.dynunet_block")
        convolutions = types.ModuleType("monai.networks.blocks.convolutions")
        layers = types.ModuleType("monai.networks.layers")
        layers_utils = types.ModuleType("monai.networks.layers.utils")
        factories = types.ModuleType("monai.networks.layers.factories")

        dynunet_block.UnetOutBlock = UnetOutBlock
        convolutions.Convolution = Convolution
        layers_utils.get_act_layer = get_act_layer
        layers_utils.get_norm_layer = get_norm_layer

        class _Factory:
            PRELU = "prelu"
            INSTANCE = "instance"
            BATCH = "batch"

        factories.Act = _Factory
        factories.Norm = _Factory
        # vit.py imports these but never uses them
        blocks.UnetrBasicBlock = None
        blocks.UnetrPrUpBlock = None
        blocks.UnetrUpBlock = None
        blocks.dynunet_block = dynunet_block
        blocks.convolutions = convolutions
        layers.utils = layers_utils
        layers.factories = factories
        networks.blocks = blocks
        networks.layers = layers
        monai.networks = networks

        for name, mod in [
            ("monai", monai),
            ("monai.networks", networks),
            ("monai.networks.blocks", blocks),
            ("monai.networks.blocks.dynunet_block", dynunet_block),
            ("monai.networks.blocks.convolutions", convolutions),
            ("monai.networks.layers", layers),
            ("monai.networks.layers.utils", layers_utils),
            ("monai.networks.layers.factories", factories),
        ]:
            sys.modules[name] = mod

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import networks  # noqa: F401  (reference package)

    return networks
