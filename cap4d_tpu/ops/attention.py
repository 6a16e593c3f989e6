"""Multi-head attention for the MMDM with TPU flash-kernel dispatch.

Reference parity: cap4d/mmdm/net/attention.py:112-251 (AttentionModule) — the
reference dispatches between einsum ("legacy") attention with fp32 softmax and
xformers/flash-attn CUDA kernels via env vars. Here the layout modes are
sequence reshapes around ONE attention primitive:

  spatial : (b·t, n, h, d)       — per-frame self attention
  temporal: (b·n, t, h, d)       — per-pixel cross-frame attention
  3d      : (b, n·t, h, d)       — joint multi-view attention (V·64·64 = 32k
            tokens at the 64×64 level; the hot sequence length)

Backends:
  einsum — exact jnp attention, softmax in fp32 (matches ATTN_PRECISION=fp32
           semantics of attention.py:112-132). Used on CPU and for parity tests.
  flash  — Pallas TPU flash-attention kernel (jax.experimental.pallas.ops),
           numerically equivalent online-softmax algorithm.
Default "auto" picks flash on TPU, einsum elsewhere.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

Backend = Literal["auto", "einsum", "flash"]


def _einsum_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) exact attention; softmax accumulated in fp32."""
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32), k.astype(jnp.float32))
    sim = sim * scale
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn.astype(v.dtype), v)
    return out


@functools.lru_cache(maxsize=1)
def _flash_fn():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    def run(q, k, v):  # (B, H, S, D)
        seq = q.shape[2]
        # 1024 measured ~10% faster than 512 on v5e at the MMDM's 2k-32k
        # sequence lengths; 2048 fails to compile (VMEM)
        if seq <= 1024:
            blk = seq
        elif seq % 1024 == 0:
            blk = 1024
        else:
            blk = 512
        sizes = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_q_dkv=blk, block_k_dkv=blk,
            block_q_dq=blk, block_k_dq=blk, block_k_major_dq=blk,
        )
        # the pallas kernel defaults to sm_scale=1.0 — pass the standard
        # 1/sqrt(d) explicitly or attention silently runs unscaled
        return flash_attention(q, k, v, causal=False, block_sizes=sizes,
                               sm_scale=q.shape[-1] ** -0.5)

    return run


def dot_product_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    backend: Backend = "auto",
) -> jnp.ndarray:
    """Non-causal MHA over (batch, seq, heads, head_dim)."""
    if backend == "auto":
        backend = "flash" if jax.default_backend() == "tpu" else "einsum"
    if backend == "einsum":
        return _einsum_attention(q, k, v)
    if backend == "flash":
        # pallas kernels want (B, H, S, D) and S a multiple of the block size
        from cap4d_tpu.ops import flash_attention as ffa

        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        seq = qt.shape[2]
        if ffa.supported(qt.shape, qt.dtype):
            # d=64-specialized forward kernel (VMEM-resident K/V, online
            # softmax, ~1.5× the generic kernel on the MMDM shapes);
            # training still gets full gradients via its custom VJP
            return jnp.swapaxes(ffa.flash_attention_fwdopt(qt, kt, vt), 1, 2)
        if seq > 1024 and seq % 512 != 0:
            return _einsum_attention(q, k, v)
        out = _flash_fn()(qt, kt, vt)
        return jnp.swapaxes(out, 1, 2)
    raise ValueError(f"unknown attention backend {backend}")


def attention_mode_reshape(x: jnp.ndarray, mode: str, t: int, heads: int):
    """(b·t, n, h·d) → attention layout (B, S, h, d) per mode; returns
    (reshaped, unreshape_fn). Sequence folding per attention.py:201-229."""
    bt, n, hd = x.shape
    d = hd // heads
    if mode == "spatial":
        y = x.reshape(bt, n, heads, d)
        return y, lambda o: o.reshape(bt, n, hd)
    if mode == "temporal":
        b = bt // t
        y = x.reshape(b, t, n, heads, d).transpose(0, 2, 1, 3, 4).reshape(b * n, t, heads, d)
        def un(o):
            o = o.reshape(b, n, t, heads, d).transpose(0, 2, 1, 3, 4)
            return o.reshape(bt, n, hd)
        return y, un
    if mode == "3d":
        b = bt // t
        # (b t) n (h d) -> b (n t) h d: attention is permutation-invariant over
        # the joint sequence, so (t n) ordering is equivalent; we use t-major.
        y = x.reshape(b, t * n, heads, d)
        return y, lambda o: o.reshape(bt, n, hd)
    raise ValueError(f"unknown attention mode {mode}")
