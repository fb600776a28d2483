"""One-way import of reference PyTorch checkpoints into this framework.

Translates a reference CaloDiffusion ``CondUnet`` state_dict (reference:
calodiffusion/models/models.py:523-777; checkpoint layouts handled by
calodiffusion.py:31-37) into the Flax parameter tree, so users can bring
trained reference models across.  Weight-layout transforms:

- Conv3d        torch (Cout, Cin, kz, ka, kr) -> flax (kz, ka, kr, Cin, Cout)
- ConvTranspose torch (Cin, Cout, kz, ka, kr) -> flax (kz, ka, kr, Cin, Cout)
- Linear        torch (out, in)               -> flax (in, out)
- GroupNorm     weight -> scale, bias -> bias

Covers: init conv, time/cond MLPs (both sinusoidal and linear stems),
down/mid/up ResnetBlocks, Down/Upsample convs, LinearAttention blocks with
their PreNorm wrappers, the final block+1x1 conv, and dataset-1 NNConverter
enc/dec matrices.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _t_convT(w):
    return np.transpose(np.asarray(w), (2, 3, 4, 0, 1))


def _t_lin(w):
    return np.asarray(w).T


def _conv_prefix(sd, base):
    """Reference cylindrical convs nest the torch conv as ``.conv``;
    plain convs don't."""
    if f"{base}.conv.weight" in sd:
        return f"{base}.conv"
    if f"{base}.convTrans.weight" in sd:
        return f"{base}.convTrans"
    return base


def _set(params, path, value):
    node = params
    for k in path[:-1]:
        node = node[k]
    target = node[path[-1]]
    if tuple(target.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {path}: {target.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.float32)


def _import_conv(params, sd, torch_base, flax_path, transpose=False):
    base = _conv_prefix(sd, torch_base)
    t = _t_convT if transpose else _t_conv
    _set(params, flax_path + ["kernel"], t(sd[f"{base}.weight"]))
    if f"{base}.bias" in sd:
        _set(params, flax_path + ["bias"], np.asarray(sd[f"{base}.bias"]))


def _import_groupnorm(params, sd, torch_base, flax_path):
    _set(params, flax_path + ["scale"], np.asarray(sd[f"{torch_base}.weight"]))
    _set(params, flax_path + ["bias"], np.asarray(sd[f"{torch_base}.bias"]))


def _import_linear(params, sd, torch_base, flax_path):
    _set(params, flax_path + ["kernel"], _t_lin(sd[f"{torch_base}.weight"]))
    if f"{torch_base}.bias" in sd:
        _set(params, flax_path + ["bias"], np.asarray(sd[f"{torch_base}.bias"]))


def _import_resnet_block(params, sd, torch_base, flax_path):
    _import_conv(params, sd, f"{torch_base}.block1.proj",
                 flax_path + ["Block_0", "Conv3d_0"])
    _import_groupnorm(params, sd, f"{torch_base}.block1.norm",
                      flax_path + ["Block_0", "GroupNorm_0"])
    _import_conv(params, sd, f"{torch_base}.block2.proj",
                 flax_path + ["Block_1", "Conv3d_0"])
    _import_groupnorm(params, sd, f"{torch_base}.block2.norm",
                      flax_path + ["Block_1", "GroupNorm_0"])
    if f"{torch_base}.mlp.1.weight" in sd:
        _import_linear(params, sd, f"{torch_base}.mlp.1",
                       flax_path + ["Dense_0"])
    res = _conv_prefix(sd, f"{torch_base}.res_conv")
    if f"{res}.weight" in sd:
        _import_conv(params, sd, f"{torch_base}.res_conv",
                     flax_path + ["Conv3d_0"])


def _import_linear_attention(params, sd, torch_base, flax_attn, flax_prenorm):
    """torch Residual(PreNorm(LinearAttention)) at downs_attn.N / mid_attn /
    ups_attn.N: <base>.fn.norm (PreNorm GN), <base>.fn.fn.to_qkv,
    <base>.fn.fn.to_out.{0 conv, 1 GN}."""
    _import_groupnorm(params, sd, f"{torch_base}.fn.norm",
                      flax_prenorm + ["GroupNorm_0"])
    _import_conv(params, sd, f"{torch_base}.fn.fn.to_qkv",
                 flax_attn + ["Conv3d_0"])
    _import_conv(params, sd, f"{torch_base}.fn.fn.to_out.0",
                 flax_attn + ["Conv3d_1"])
    _import_groupnorm(params, sd, f"{torch_base}.fn.fn.to_out.1",
                      flax_attn + ["GroupNorm_0"])


def _import_convnext_block(params, sd, torch_base, flax_path):
    """Reference ConvNextBlock (models.py:203-243): ds_conv (depthwise 7^3),
    mlp.1, net = [GN, conv3, GELU, GN, conv3], optional res_conv."""
    ds = _conv_prefix(sd, f"{torch_base}.ds_conv")
    _set(params, flax_path + ["ds_kernel"], _t_conv(sd[f"{ds}.weight"]))
    if f"{ds}.bias" in sd:
        _set(params, flax_path + ["ds_bias"], np.asarray(sd[f"{ds}.bias"]))
    if f"{torch_base}.mlp.1.weight" in sd:
        _import_linear(params, sd, f"{torch_base}.mlp.1",
                       flax_path + ["Dense_0"])
    _import_groupnorm(params, sd, f"{torch_base}.net.0",
                      flax_path + ["GroupNorm_0"])
    _import_conv(params, sd, f"{torch_base}.net.1", flax_path + ["Conv3d_0"])
    _import_groupnorm(params, sd, f"{torch_base}.net.3",
                      flax_path + ["GroupNorm_1"])
    _import_conv(params, sd, f"{torch_base}.net.4", flax_path + ["Conv3d_1"])
    res = _conv_prefix(sd, f"{torch_base}.res_conv")
    if f"{res}.weight" in sd:
        _import_conv(params, sd, f"{torch_base}.res_conv",
                     flax_path + ["Conv3d_2"])


def _import_res_dense(params, sd, torch_base, flax_path):
    """Reference ResDense (models.py:373-389): dense1.0, embeder.1, dense2.0
    -> flax Dense_0/1/2 (creation order in ResDenseLayer)."""
    _import_linear(params, sd, f"{torch_base}.dense1.0", flax_path + ["Dense_0"])
    _import_linear(params, sd, f"{torch_base}.embeder.1", flax_path + ["Dense_1"])
    _import_linear(params, sd, f"{torch_base}.dense2.0", flax_path + ["Dense_2"])


def import_resnet_dense(p, sd, root):
    """Reference dense ResNet (models.py:392-457) -> ResNetDense params.

    ``root`` is the flax path of the ResNetDense module (e.g.
    ["params", "ResNetDense_0"]).  The time MLP has an Unflatten stem
    (Linears at 1,3,5); the cond MLP starts with a Linear (0,2,4) -
    _import_cond_mlp's index sniffing handles both."""
    _import_cond_mlp(p, sd, "time_mlp", root + ["time_mlp"], embed=False)
    _import_cond_mlp(p, sd, "cond_mlp", root + ["cond_mlp"], embed=False)
    _import_linear(p, sd, "in_lay", root + ["in_lay"])
    i = 0
    while f"hidden_layers.{i}.dense1.0.weight" in sd:
        _import_res_dense(p, sd, f"hidden_layers.{i}",
                          root + [f"ResDenseLayer_{i}"])
        i += 1
    _import_linear(p, sd, "out_lay", root + ["out_lay"])


def _import_cond_mlp(params, sd, torch_base, flax_path, embed: bool):
    """Sequential indices: sinusoidal stem -> Linears at 1,3; linear stem ->
    Linears at 0/1,3,5 (reference models.py:578-608)."""
    if embed:
        _import_linear(params, sd, f"{torch_base}.1", flax_path + ["Dense_0"])
        _import_linear(params, sd, f"{torch_base}.3", flax_path + ["Dense_1"])
    else:
        # linear stem: [Unflatten?, Linear, GELU, Linear, GELU, Linear] - the
        # time path has the Unflatten, the cond path doesn't
        if f"{torch_base}.0.weight" in sd:
            idxs = [0, 2, 4]
        else:
            idxs = [1, 3, 5]
        for j, idx in enumerate(idxs):
            _import_linear(params, sd, f"{torch_base}.{idx}",
                           flax_path + [f"Dense_{j}"])


def load_torch_checkpoint(path: str, model, params) -> Any:
    """Load a reference ``.pth`` checkpoint file and translate it.

    Handles both bare state_dicts and full training checkpoints with
    ``model_state_dict`` (reference train/train.py:81-84)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return torch_state_dict_to_params(sd, model, params)


def strip_model_prefix(state_dict: dict) -> dict:
    """Reference checkpoints may prefix everything with 'model.' (or another
    wrapper name; reference calodiffusion.py:31-37)."""
    keys = list(state_dict.keys())
    if not keys:
        return state_dict
    prefixes = {k.split(".")[0] for k in keys}
    for candidate in ("model", "base_model"):
        if candidate in prefixes:
            return {
                k.removeprefix(f"{candidate}."): v
                for k, v in state_dict.items()
                if k.split(".")[0] == candidate
            }
    return state_dict


def torch_state_dict_to_params(state_dict: dict, model, params) -> Any:
    """Fill ``params`` (from model.init) with translated torch weights.

    ``model`` is a CaloDiffusion instance; ``state_dict`` maps reference
    names to numpy arrays (call .numpy() on torch tensors first).
    Returns a new parameter pytree.
    """
    import jax

    sd = strip_model_prefix(state_dict)
    # deep-copy params into mutable nested dicts of numpy arrays
    params = jax.tree_util.tree_map(np.asarray, params)

    def to_mutable(d):
        if isinstance(d, dict):
            return {k: to_mutable(v) for k, v in d.items()}
        return d

    import flax

    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    p = to_mutable(dict(p))

    cfg = model.config
    if getattr(model, "fully_connected", False):
        import_resnet_dense(p, sd, ["params", "ResNetDense_0"])
    else:
        import_condunet(
            p, sd, ["params", "CondUnet_0"],
            n_res=len(list(cfg["LAYER_SIZE_UNET"])) - 1,
            block_attn=cfg.get("BLOCK_ATTN", False),
            mid_attn=cfg.get("MID_ATTN", False),
            time_embed=cfg.get("TIME_EMBED", "sin") == "sin",
            cond_embed=cfg.get("COND_EMBED", "sin") == "sin",
        )

    # dataset-1 trainable geometry embedding (reference NN_embed.encs/decs)
    nn_root = ["params", "NN_embed"]
    i = 0
    while f"NN_embed.encs.{i}.weight" in sd:
        _set(p, nn_root + [f"enc_{i}"], np.asarray(sd[f"NN_embed.encs.{i}.weight"]))
        _set(p, nn_root + [f"dec_{i}"], np.asarray(sd[f"NN_embed.decs.{i}.weight"]))
        i += 1

    # trainable HGCal GLaM matrices (reference Embeder/Decoder .mat params,
    # HGCal_utils.py:295-353; masks are module constants on both sides)
    if "NN_embed.embeder.mat" in sd:
        _set(p, nn_root + ["enc_mat"], np.asarray(sd["NN_embed.embeder.mat"]))
        _set(p, nn_root + ["dec_mat"], np.asarray(sd["NN_embed.decoder.mat"]))

    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, p)


def import_condunet(p, sd, unet, n_res, block_attn=False, mid_attn=False,
                    time_embed=True, cond_embed=True, use_convnext=False):
    """Translate a reference CondUnet state_dict rooted at ``sd``'s top level
    into the flax CondUnet subtree at path ``unet``."""
    block_name = "ConvNextBlock" if use_convnext else "ResnetBlock"
    block_import = (_import_convnext_block if use_convnext
                    else _import_resnet_block)

    _import_conv(p, sd, "init_conv", unet + ["init_conv"])
    if "time_mlp.1.weight" in sd or "time_mlp.0.weight" in sd:
        _import_cond_mlp(p, sd, "time_mlp", unet + ["time_mlp"],
                         embed=time_embed)
    _import_cond_mlp(p, sd, "cond_mlp", unet + ["cond_mlp"],
                     embed=cond_embed)

    rb = 0  # flax block counter (call order)
    ds = 0  # downsample Conv3d counter
    attn = 0  # LinearAttention / PreNormResidual counter
    for i in range(n_res):
        block_import(p, sd, f"downs.{i}.0",
                     unet + [f"{block_name}_{rb}"]); rb += 1
        block_import(p, sd, f"downs.{i}.1",
                     unet + [f"{block_name}_{rb}"]); rb += 1
        if block_attn:
            _import_linear_attention(
                p, sd, f"downs_attn.{i}", unet + [f"LinearAttention_{attn}"],
                unet + [f"PreNormResidual_{attn}"],
            )
            attn += 1
        if i < n_res - 1:
            _import_conv(p, sd, f"downs.{i}.2", unet + [f"Conv3d_{ds}"])
            ds += 1

    block_import(p, sd, "mid_block1",
                 unet + [f"{block_name}_{rb}"]); rb += 1
    if mid_attn:
        _import_linear_attention(
            p, sd, "mid_attn", unet + [f"LinearAttention_{attn}"],
            unet + [f"PreNormResidual_{attn}"],
        )
        attn += 1
    block_import(p, sd, "mid_block2",
                 unet + [f"{block_name}_{rb}"]); rb += 1

    up = 0
    for i in range(n_res):
        block_import(p, sd, f"ups.{i}.0",
                     unet + [f"{block_name}_{rb}"]); rb += 1
        block_import(p, sd, f"ups.{i}.1",
                     unet + [f"{block_name}_{rb}"]); rb += 1
        if block_attn:
            _import_linear_attention(
                p, sd, f"ups_attn.{i}", unet + [f"LinearAttention_{attn}"],
                unet + [f"PreNormResidual_{attn}"],
            )
            attn += 1
        if i < n_res - 1:
            _import_conv(p, sd, f"ups.{i}.2",
                         unet + [f"Conv3dTranspose_{up}"], transpose=True)
            up += 1

    block_import(p, sd, "final_conv.0",
                 unet + [f"{block_name}_{rb}"]); rb += 1
    _import_conv(p, sd, "final_conv.1", unet + ["final_conv"])
