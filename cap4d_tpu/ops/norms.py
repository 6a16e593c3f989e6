"""Fused GroupNorm(+SiLU) Pallas kernel for NHWC activations.

The UNet/VAE towers are full of GroupNorm32 → SiLU → conv chains
(openaimodel.py normalization(); diffusionmodules/model.py Normalize()). XLA
fuses the elementwise tail but materialises the normalised tensor between the
two reduction passes; this kernel keeps one (H·W, C) block resident in VMEM,
computes the per-group statistics and applies scale/bias + SiLU in a single
pass over HBM.

Used behind `fused_group_norm_silu` with an XLA fallback (interpret-incapable
backends, odd shapes); correctness is tested against the flax GroupNorm path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
                    eps: float, apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    gs = c // num_groups
    # group reductions as an indicator matmul — Mosaic has no layout for the
    # (HW, G, C/G) reshape, but (C, G) one-hot contractions map onto the MXU
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gs
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (ch_ids == g_ids).astype(jnp.float32)          # (C, G)

    s1 = jnp.sum(x, axis=0, keepdims=True)                   # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    # HIGHEST: default MXU precision truncates the fp32 operands to one
    # bf16 pass (~1e-2 error in the stats, observed on chip)
    hi = jax.lax.Precision.HIGHEST
    g1 = jnp.dot(s1, onehot, preferred_element_type=jnp.float32,
                 precision=hi)                                    # (1, G)
    g2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32, precision=hi)
    denom = float(hw * gs)
    mean_g = g1 / denom
    var_g = g2 / denom - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32,
                     precision=hi)                                # (1, C)
    rstd_c = jnp.dot(rstd_g, onehot.T, preferred_element_type=jnp.float32,
                     precision=hi)

    out = (x - mean_c) * rstd_c * scale_ref[0].astype(jnp.float32) \
        + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _gn_silu_jnp(x, scale, bias, num_groups, eps, apply_silu):
    n, h, w, c = x.shape
    xg = x.reshape(n, h * w, num_groups, c // num_groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    out = xn * scale + bias
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _gn_silu_pallas(x, scale, bias, num_groups, eps, apply_silu):
    n, h, w, c = x.shape
    kernel = partial(_gn_silu_kernel, num_groups=num_groups, eps=eps,
                     apply_silu=apply_silu)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
    )(x.reshape(n, h * w, c), scale.reshape(1, c), bias.reshape(1, c)
      ).reshape(n, h, w, c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_silu(x, scale, bias, num_groups, eps, apply_silu):
    return _gn_silu_pallas(x, scale, bias, num_groups, eps, apply_silu)


def _gn_silu_fwd(x, scale, bias, num_groups, eps, apply_silu):
    out = _gn_silu_pallas(x, scale, bias, num_groups, eps, apply_silu)
    return out, (x, scale, bias)


def _gn_silu_bwd(num_groups, eps, apply_silu, res, g):
    # recompute-based backward through the (identical) jnp formulation — the
    # kernel wins the forward pass; XLA handles the gradient
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _gn_silu_jnp(x_, s_, b_, num_groups, eps, apply_silu),
        x, scale, bias)
    return vjp(g)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


@partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu"))
def fused_group_norm_silu(
    x: jnp.ndarray,        # (N, H, W, C)
    scale: jnp.ndarray,    # (C,)
    bias: jnp.ndarray,     # (C,)
    num_groups: int = 32,
    eps: float = 1e-5,
    apply_silu: bool = True,
) -> jnp.ndarray:
    """GroupNorm over (H, W, group-channels) + affine (+ SiLU), fp32 stats.

    Pallas forward with a recompute-based custom VJP; falls back to plain jnp
    when the per-sample block exceeds the VMEM budget or off-TPU."""
    n, h, w, c = x.shape
    # fp32 working set in VMEM ≈ 3×(HW·C) floats (x, x², out)
    block_bytes = h * w * c * 4 * 3
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or block_bytes > 12 * 1024 * 1024 or c % num_groups:
        return _gn_silu_jnp(x, scale, bias, num_groups, eps, apply_silu)
    return _gn_silu(x, scale, bias, num_groups, eps, apply_silu)
