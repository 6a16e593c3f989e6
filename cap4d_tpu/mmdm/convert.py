"""Torch checkpoint → Flax parameter conversion for the MMDM UNet and VAE.

The released CAP4D weights (data/weights/mmdm/checkpoints/*.ckpt, loaded at
cap4d/inference/utils.py:44-61) are a torch state_dict over the MMLDM module
tree. This module maps those names onto the Flax parameter tree of
cap4d_tpu.mmdm.unet.MMDMUNet / vae.AutoencoderKL, transposing conv kernels
(O,I,kh,kw)→(kh,kw,I,O) and dense kernels (O,I)→(I,O).

The conversion is validated structurally: every flax leaf must find exactly
one torch tensor of the matching (transposed) shape, and unused torch keys are
reported.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Tuple

import numpy as np

UNET_PREFIX = "model.diffusion_model."
VAE_PREFIX = "first_stage_model."


def _leaf_name(flax_leaf: str) -> str:
    return {"kernel": "weight", "scale": "weight", "bias": "bias"}[flax_leaf]


def _top_block(tok: str) -> str:
    """input_blocks_4_1 → input_blocks.4.1 ; middle_block_2 → middle_block.2 ;
    time_embed_0 → time_embed.0"""
    for pre in ("input_blocks", "output_blocks", "middle_block", "time_embed"):
        if tok.startswith(pre + "_"):
            rest = tok[len(pre) + 1 :].replace("_", ".")
            return f"{pre}.{rest}"
    return tok


_UNET_TOKENS = {
    "norm_in": "in_layers.0",
    "conv_in": "in_layers.2",
    "emb_proj": "emb_layers.1",
    "norm_out": "out_layers.0",
    "conv_out": "out_layers.3",
    "skip": "skip_connection",
    "block0": "transformer_blocks.0",
    "to_out": "to_out.0",
    "geglu_proj": "net.0.proj",
}


def unet_torch_key(path: Tuple[str, ...]) -> str:
    """Flax param path → torch state_dict key (without the UNET_PREFIX)."""
    parts = [p for p in path if p not in ("gn", "ln")]
    leaf = _leaf_name(parts[-1])
    toks = parts[:-1]
    if toks[0] == "out_norm":
        return f"out.0.{leaf}"
    if toks[0] == "out_conv":
        return f"out.2.{leaf}"
    out = [_top_block(toks[0])]
    prev = None
    for t in toks[1:]:
        if t == "proj_out" and prev == "ff":
            out.append("net.2")
        elif t in _UNET_TOKENS:
            out.append(_UNET_TOKENS[t])
        else:
            out.append(t)
        prev = t
    return ".".join(out + [leaf])


def _vae_block(tok: str) -> str:
    """down_1_block_0 → down.1.block.0 ; mid_attn_1 → mid.attn_1 ;
    up_3_upsample → up.3.upsample"""
    if tok.startswith(("down_", "up_")):
        parts = tok.split("_")
        if "block" in parts:
            return f"{parts[0]}.{parts[1]}.block.{parts[3]}"
        return f"{parts[0]}.{parts[1]}.{parts[2]}"
    if tok.startswith("mid_"):
        return "mid." + tok[4:]
    return tok


def vae_torch_key(path: Tuple[str, ...]) -> str:
    parts = [p for p in path if p not in ("gn", "ln")]
    leaf = _leaf_name(parts[-1])
    out = [parts[0]] if parts[0] in ("encoder", "decoder") else []
    toks = parts[len(out) : -1]
    for t in toks:
        out.append(_vae_block(t))
    return ".".join(out + [leaf])


def _to_flax_array(torch_tensor, flax_shape) -> np.ndarray:
    arr = np.asarray(torch_tensor, dtype=np.float32)
    if arr.ndim == 4:  # conv (O,I,kh,kw) → (kh,kw,I,O)
        arr = arr.transpose(2, 3, 1, 0)
    elif arr.ndim == 2:  # dense (O,I) → (I,O)
        arr = arr.T
    if tuple(arr.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch: torch {arr.shape} vs flax {tuple(flax_shape)}")
    return arr


def convert_state_dict(
    flax_params: Mapping[str, Any],
    torch_state: Mapping[str, np.ndarray],
    key_fn,
    prefix: str = "",
) -> Tuple[Dict[str, Any], list]:
    """Fill a flax param tree from a torch state_dict. Returns (params, missing)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    out_leaves, missing = [], []
    for keypath, leaf in flat:
        path = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in keypath)
        tkey = prefix + key_fn(path)
        if tkey not in torch_state:
            missing.append(tkey)
            out_leaves.append(leaf)
        else:
            out_leaves.append(_to_flax_array(torch_state[tkey], leaf.shape))
    return jax.tree_util.tree_unflatten(treedef, out_leaves), missing


def load_mmdm_checkpoint(
    ckpt_path: str | Path,
    unet_params: Mapping[str, Any],
    vae_params: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load the released .ckpt and convert both networks' weights.

    Raises if any flax parameter has no torch counterpart.
    """
    import torch

    state = torch.load(str(ckpt_path), map_location="cpu")
    if "state_dict" in state:
        state = state["state_dict"]
    state_np = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}

    unet, miss_u = convert_state_dict(unet_params, state_np, unet_torch_key, UNET_PREFIX)
    vae, miss_v = convert_state_dict(vae_params, state_np, vae_torch_key, VAE_PREFIX)
    missing = miss_u + miss_v
    if missing:
        raise KeyError(f"{len(missing)} parameters missing from checkpoint, e.g. {missing[:5]}")
    return unet, vae
