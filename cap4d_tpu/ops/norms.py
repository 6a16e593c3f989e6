"""Fused GroupNorm(+SiLU) Pallas kernel for NHWC activations.

The UNet/VAE towers are full of GroupNorm32 → SiLU → conv chains
(openaimodel.py normalization(); diffusionmodules/model.py Normalize()). XLA
fuses the elementwise tail but materialises the normalised tensor between the
two reduction passes; this kernel streams the (H·W, C) sample through VMEM in
double-buffered row chunks (the tensor itself stays in HBM), computing the
per-group statistics in one pass and applying the folded affine + SiLU in a
second — 2 HBM reads + 1 write per element, the bandwidth floor for an
unfused-stats norm, with no resident-block VMEM limit on the sample size.

Used behind `fused_group_norm_silu` with an XLA fallback (interpret-incapable
backends, odd shapes); correctness is tested against the flax GroupNorm path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_hbm, scale_ref, bias_ref, o_hbm, xbuf, obuf, in_sem,
                    out_sem, *, num_groups: int, eps: float, apply_silu: bool,
                    row_chunk: int, c: int):
    # the HBM view is (N, HW/r, r·C) with r chosen so r·C is 128-aligned —
    # Mosaic DMA slices must be tile-aligned in the minor dim, and the UNet's
    # C=320/960 channel counts aren't. scale/bias arrive pre-tiled to r·C.
    i = pl.program_id(0)
    rows, cf = x_hbm.shape[1], x_hbm.shape[2]   # folded rows / folded channels
    gs = c // num_groups
    nck = rows // row_chunk

    def in_copy(k, slot):
        return pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(k * row_chunk, row_chunk), :],
            xbuf.at[slot], in_sem.at[slot])

    def out_copy(k, slot):
        return pltpu.make_async_copy(
            obuf.at[slot],
            o_hbm.at[i, pl.ds(k * row_chunk, row_chunk), :], out_sem.at[slot])

    # group reductions as an indicator matmul — Mosaic has no layout for the
    # (HW, G, C/G) reshape, but (Cf, G) one-hot contractions map onto the MXU.
    # folded column j holds channel j % C, hence group (j % C) // gs
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (cf, num_groups), 0) % c // gs
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (cf, num_groups), 1)
    onehot = (ch_ids == g_ids).astype(jnp.float32)          # (Cf, G)

    # ---- pass 1: per-channel sums over double-buffered chunks ----
    in_copy(0, 0).start()

    def stat_body(k, carry):
        s1, s2 = carry
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nck)
        def _():
            in_copy(k + 1, jax.lax.rem(k + 1, 2)).start()

        in_copy(k, slot).wait()
        xc = xbuf[slot].astype(jnp.float32)
        return (s1 + jnp.sum(xc, axis=0, keepdims=True),
                s2 + jnp.sum(xc * xc, axis=0, keepdims=True))

    s1, s2 = jax.lax.fori_loop(
        0, nck, stat_body,
        (jnp.zeros((1, cf), jnp.float32), jnp.zeros((1, cf), jnp.float32)))

    # HIGHEST: default MXU precision truncates the fp32 operands to one
    # bf16 pass (~1e-2 error in the stats, observed on chip)
    hi = jax.lax.Precision.HIGHEST
    g1 = jnp.dot(s1, onehot, preferred_element_type=jnp.float32,
                 precision=hi)                                    # (1, G)
    g2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32, precision=hi)
    denom = float(rows * (cf // c) * gs)
    mean_g = g1 / denom
    var_g = g2 / denom - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32,
                     precision=hi)                                # (1, Cf)
    rstd_c = jnp.dot(rstd_g, onehot.T, preferred_element_type=jnp.float32,
                     precision=hi)

    # fold the affine into one FMA per element:
    # (x - mean)·rstd·scale + bias = x·(rstd·scale) + (bias - mean·rstd·scale)
    scale_eff = rstd_c * scale_ref[0].astype(jnp.float32)         # (1, C)
    bias_eff = bias_ref[0].astype(jnp.float32) - mean_c * scale_eff

    # ---- pass 2: normalise + SiLU, streaming chunks back out ----
    in_copy(0, 0).start()

    def apply_body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nck)
        def _():
            in_copy(k + 1, jax.lax.rem(k + 1, 2)).start()

        in_copy(k, slot).wait()

        @pl.when(k >= 2)
        def _():
            # the out DMA that used this slot two iterations ago must land
            # before the buffer is overwritten
            out_copy(k - 2, slot).wait()

        out = xbuf[slot].astype(jnp.float32) * scale_eff + bias_eff
        if apply_silu:
            out = out * jax.nn.sigmoid(out)
        obuf[slot] = out.astype(obuf.dtype)
        out_copy(k, slot).start()
        return 0

    jax.lax.fori_loop(0, nck, apply_body, 0)
    # drain the tail out-DMAs (every started DMA must be awaited)
    if nck >= 2:
        out_copy(nck - 2, (nck - 2) % 2).wait()
    out_copy(nck - 1, (nck - 1) % 2).wait()


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


def _fold(c: int) -> int:
    """Rows folded per DMA row: smallest r with (r·C) % 128 == 0, so the HBM
    chunk slices are tile-aligned in the minor dim (Mosaic requirement)."""
    import math
    return 128 // math.gcd(c, 128)


def _row_chunk(rows: int, cf: int) -> int:
    """Largest power-of-two divisor of the folded row count whose f32 chunk
    stays <= 1 MB — the kernel keeps ~3 (chunk, Cf) f32 temporaries on the
    scoped-VMEM stack plus the four chunk-sized DMA buffers, so wide-C shapes
    (decoder concat norms at C=1920/2560) need shorter chunks."""
    ck = 512
    while ck > 8 and (rows % ck or ck * cf * 4 > 1 * 1024 * 1024):
        ck //= 2
    return ck


def _gn_silu_pallas(x, scale, bias, num_groups, eps, apply_silu):
    n, h, w, c = x.shape
    r = _fold(c)
    rows, cf = (h * w) // r, r * c
    ck = _row_chunk(rows, cf)
    kernel = partial(_gn_silu_kernel, num_groups=num_groups, eps=eps,
                     apply_silu=apply_silu, row_chunk=ck, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, rows, cf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ck, cf), x.dtype),
            pltpu.VMEM((2, ck, cf), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x.reshape(n, rows, cf),
      jnp.tile(scale.reshape(1, c), (1, r)),
      jnp.tile(bias.reshape(1, c), (1, r))).reshape(n, h, w, c)


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
    off-TPU or when the row-chunk streaming layout doesn't divide the shape."""
    n, h, w, c = x.shape
    on_tpu = jax.default_backend() == "tpu"
    r = _fold(c)
    rows = (h * w) // r
    if (not on_tpu or c % num_groups or (h * w) % r
            or rows % _row_chunk(rows, r * c)):
        return _gn_silu_jnp(x, scale, bias, num_groups, eps, apply_silu)
    return _gn_silu(x, scale, bias, num_groups, eps, apply_silu)
