"""Import reference PyTorch checkpoints (shouwangzhe134/Hybrid-CTUNet state
dicts) into this framework's flax parameter pytrees.

Covers the reference's checkpoint surface (trainer_CTUNet.py:308-317 saves
``{"epoch", "best_acc", "state_dict", "optimizer", "scheduler"}``; mains strip
a ``backbone.`` prefix and load non-strict, main_CTUNet.py:166-178). Dead
reference parameters (the always-constructed-but-unused ResBlock ``conv3``
when in==out, DropPath etc.) are skipped.

Tensor layout conversions (torch -> channels-last JAX):
  Linear   (out, in)            -> kernel (in, out)
  Conv3d   (Cout, Cin, k0..k2)  -> kernel (k0, k1, k2, Cin, Cout)
  ConvT3d  (Cin, Cout, k0..k2)  -> kernel (k0, k1, k2, Cin, Cout)
  LayerNorm weight/bias         -> scale/bias
  Embedding / pos_embedding     -> unchanged

The input is a flat ``{name: numpy array}`` dict so this module does not
require torch; use :func:`load_torch_state_dict` (which does) to read ``.pt``
files directly.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pt`` checkpoint into numpy (requires torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        k = k.replace("backbone.", "")  # reference main_CTUNet.py:172
        out[k] = v.detach().cpu().numpy()
    return out


def _linear(w):
    return np.ascontiguousarray(w.T)


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _convT(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _ln(tree, dst, sd, src):
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _dense(tree, dst, sd, src, bias=True):
    _set(tree, f"{dst}/kernel", _linear(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _conv3d(tree, dst, sd, src, bias=False):
    _set(tree, f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _resblock(tree, dst, sd, src, in_ch=None, out_ch=None, stride_one=True):
    """Reference ResBlock (hybrid_CTUNet.py:29-105). conv3 is imported only
    when the forward actually uses it (in!=out or stride!=1)."""
    _conv3d(tree, f"{dst}/conv1", sd, f"{src}.conv1.conv")
    _conv3d(tree, f"{dst}/conv2", sd, f"{src}.conv2.conv")
    w3 = sd.get(f"{src}.conv3.conv.weight")
    if w3 is not None:
        cin, cout = w3.shape[1], w3.shape[0]
        if cin != cout or not stride_one:
            _conv3d(tree, f"{dst}/conv3", sd, f"{src}.conv3.conv")


def _pixelweight(tree, dst, sd, src):
    _ln(tree, f"{dst}/norm1", sd, f"{src}.norm1")
    _ln(tree, f"{dst}/norm2", sd, f"{src}.norm2")
    _dense(tree, f"{dst}/to_qkv1", sd, f"{src}.to_qkv1", bias=False)
    _dense(tree, f"{dst}/to_qkv2", sd, f"{src}.to_qkv2", bias=False)
    _dense(tree, f"{dst}/to_out", sd, f"{src}.to_out.0", bias=False)


def _head(tree, dst, sd, src):
    _conv3d(tree, f"{dst}/conv", sd, f"{src}.conv.conv", bias=True)


def _vit(tree, dst, sd, src, depth=12, scan_layers=True):
    _ln(tree, f"{dst}/patch_norm1", sd, f"{src}.to_patch_embedding.1")
    _dense(tree, f"{dst}/patch_proj", sd, f"{src}.to_patch_embedding.2")
    _ln(tree, f"{dst}/patch_norm2", sd, f"{src}.to_patch_embedding.3")
    _set(tree, f"{dst}/pos_embedding", sd[f"{src}.pos_embedding"])
    per_block = []
    for i in range(depth):
        b = f"{src}.transformer.{i}"
        bt: dict = {}
        _ln(bt, "attn/norm", sd, f"{b}.attn.norm")
        _dense(bt, "attn/to_qkv", sd, f"{b}.attn.to_qkv", bias=False)
        _dense(bt, "attn/to_out", sd, f"{b}.attn.to_out.0")
        _ln(bt, "ff/norm", sd, f"{b}.ff.net.0")
        _dense(bt, "ff/fc1", sd, f"{b}.ff.net.1")
        _dense(bt, "ff/fc2", sd, f"{b}.ff.net.4")
        per_block.append(bt)
    if scan_layers:
        # ViT3D(scan_layers=True): identical blocks run under nn.scan with
        # params stacked on a leading depth axis.
        import jax

        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_block)
        _set_tree(tree, f"{dst}/blocks", stacked)
    else:
        for i, bt in enumerate(per_block):
            _set_tree(tree, f"{dst}/block{i}", bt)


def _set_tree(tree: dict, path: str, subtree: dict):
    node = tree
    for p in path.split("/"):
        node = node.setdefault(p, {})
    node.update(subtree)


def _window_attn(tree, dst, sd, src):
    _ln(tree, f"{dst}/norm", sd, f"{src}.norm")
    _dense(tree, f"{dst}/to_qkv", sd, f"{src}.to_qkv", bias=False)
    _set(tree, f"{dst}/rel_pos_bias", sd[f"{src}.rel_pos_bias.weight"])
    _dense(tree, f"{dst}/to_out", sd, f"{src}.to_out.0", bias=False)


def _ffn(tree, dst, sd, src):
    _ln(tree, f"{dst}/norm", sd, f"{src}.net.0")
    _dense(tree, f"{dst}/fc1", sd, f"{src}.net.1")
    _dense(tree, f"{dst}/fc2", sd, f"{src}.net.4")


def _up_attention(tree, dst, sd, src):
    """Reference UpAttentionBlock stage layouts (hybrid_CTUNet.py:554-583):
    stages 0-2 are Sequential[Rearrange, Res(MAA), Res(FF), Rearrange,
    Rearrange, Res(MAA), Res(FF), Rearrange, PixelShuffle]; stage 3 is
    [Rearrange, Res(FF), Res(FF), Rearrange, PixelShuffle]."""
    for ind in range(4):
        base = f"{src}.layers.{ind}.0"
        if ind <= 2:
            _window_attn(tree, f"{dst}/stage{ind}_block_attn", sd, f"{base}.1.fn")
            _ffn(tree, f"{dst}/stage{ind}_block_ff", sd, f"{base}.2.fn")
            _window_attn(tree, f"{dst}/stage{ind}_grid_attn", sd, f"{base}.5.fn")
            _ffn(tree, f"{dst}/stage{ind}_grid_ff", sd, f"{base}.6.fn")
            shuffle = f"{base}.8"
        else:
            _ffn(tree, f"{dst}/stage{ind}_ff1", sd, f"{base}.1.fn")
            _ffn(tree, f"{dst}/stage{ind}_ff2", sd, f"{base}.2.fn")
            shuffle = f"{base}.4"
        _dense(tree, f"{dst}/stage{ind}_shuffle/to_out", sd, f"{shuffle}.to_out")


def _resnet(tree, dst, sd, src, layers, scan_blocks=True):
    _conv3d(tree, f"{dst}/conv1", sd, f"{src}.conv1.conv")
    for stage, blocks in enumerate(layers, start=1):
        per_block = []
        for b in range(blocks):
            tsrc = f"{src}.layer{stage}.{b}"
            bt: dict = {}
            for j in (1, 2, 3):
                _conv3d(bt, f"conv{j}", sd, f"{tsrc}.conv{j}.conv")
            if f"{tsrc}.downsample.0.conv.weight" in sd:
                _conv3d(bt, "downsample_conv", sd, f"{tsrc}.downsample.0.conv")
            per_block.append(bt)
        _set_tree(tree, f"{dst}/layer{stage}_block0", per_block[0])
        if scan_blocks and blocks > 1:
            # ResNet3D(scan_blocks=True): tail blocks stacked under nn.scan
            # as layer{k}_tail/block with a leading depth axis.
            import jax

            stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_block[1:])
            _set_tree(tree, f"{dst}/layer{stage}_tail/block", stacked)
        else:
            for b, bt in enumerate(per_block[1:], start=1):
                _set_tree(tree, f"{dst}/layer{stage}_block{b}", bt)


_RESNET_LAYERS = {50: (3, 4, 6, 3), 101: (8, 9, 13, 3), 152: (8, 9, 30, 3), 200: (8, 25, 30, 3)}


def _tunet_core(tree, prefix, sd, depth=12):
    """The ViT branch shared by TUNet and CTUNet (identical key names in the
    reference: vit, vit_encoder0, vit_encoder, vit_decoder0,
    decoder_linear_96x96, vit_out)."""
    _vit(tree, f"{prefix}/vit", sd, "vit", depth=depth)
    _resblock(tree, f"{prefix}/vit_encoder0", sd, "vit_encoder0.layer")
    _up_attention(tree, f"{prefix}/vit_encoder", sd, "vit_encoder")
    _resblock(tree, f"{prefix}/vit_decoder0/conv_block", sd, "vit_decoder0.conv_block")
    _dense(tree, f"{prefix}/decoder_linear_96x96", sd, "decoder_linear_96x96.head")
    _head(tree, f"{prefix}/vit_out", sd, "vit_out")


def convert_cunet(sd: Dict[str, np.ndarray], model_depth: int = 101) -> dict:
    tree: dict = {}
    _resnet(tree, "convnet", sd, "convnet", _RESNET_LAYERS[model_depth])
    for k in (3, 2, 1):
        dst = f"res_decoder{k}"
        _set(tree, f"{dst}/transp_conv/kernel", _convT(sd[f"{dst}.transp_conv.conv.weight"]))
        _resblock(tree, f"{dst}/conv_block", sd, f"{dst}.conv_block")
    _set(tree, "res_decoder0/transp_conv/kernel", _convT(sd["res_decoder0.transp_conv.conv.weight"]))
    _resblock(tree, "res_decoder0/conv_block", sd, "res_decoder0.conv_block")
    _head(tree, "res_out", sd, "res_out")
    _head(tree, "res_out_48x48", sd, "res_out_48x48")
    _head(tree, "res_out_24x24", sd, "res_out_24x24")
    return {"params": tree}


def convert_tunet(sd: Dict[str, np.ndarray], depth: int = 12) -> dict:
    tree: dict = {}
    _tunet_core(tree, "core", sd, depth=depth)
    return {"params": tree}


def convert_ctunet(sd: Dict[str, np.ndarray], model_depth: int = 101, depth: int = 12) -> dict:
    tree: dict = {}
    _tunet_core(tree, "core", sd, depth=depth)
    _resnet(tree, "convnet", sd, "convnet", _RESNET_LAYERS[model_depth])
    for k in (3, 2, 1):
        dst = f"res_decoder{k}"
        _set(tree, f"{dst}/transp_conv/kernel", _convT(sd[f"{dst}.transp_conv.conv.weight"]))
        _pixelweight(tree, f"{dst}/pixelweight_attention1", sd, f"{dst}.pixelweight_attention1")
        _pixelweight(tree, f"{dst}/pixelweight_attention2", sd, f"{dst}.pixelweight_attention2")
        _resblock(tree, f"{dst}/up_addconv_block1", sd, f"{dst}.up_addconv_block1")
        _resblock(tree, f"{dst}/up_addconv_block2", sd, f"{dst}.up_addconv_block2")
    _set(tree, "res_decoder0/transp_conv/kernel", _convT(sd["res_decoder0.transp_conv.conv.weight"]))
    _resblock(tree, "res_decoder0/conv_block", sd, "res_decoder0.conv_block")
    _head(tree, "res_out", sd, "res_out")
    _head(tree, "res_out_48x48", sd, "res_out_48x48")
    _head(tree, "res_out_24x24", sd, "res_out_24x24")
    return {"params": tree}


def convert_reference_state_dict(sd: Dict[str, np.ndarray], model_name: str, **kw) -> dict:
    fn = {"cunet": convert_cunet, "tunet": convert_tunet, "ctunet": convert_ctunet}[model_name]
    return fn(sd, **kw)
