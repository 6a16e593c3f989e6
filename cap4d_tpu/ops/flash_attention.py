"""Forward-specialized Pallas flash attention for the MMDM's d=64 heads.

The sampler's denoise step is forward-only, and at head_dim 64 both
attention matmuls run at ≤50% MXU occupancy (a 64-deep contraction on the
128-deep systolic array), so the generic jax.experimental flash kernel's
extra bookkeeping (segment ids, causal machinery, small k-blocks) costs real
time: profiled 5.1 ms per 16×5×4096 call (~35% MXU). This kernel keeps the
whole K/V resident in VMEM (S ≤ 8k · d 64 · bf16 = 2 MB), streams 1024-row
q blocks over 1024-column k blocks with the standard online-softmax
recurrence, and leaves everything but max/exp on the MXU.

Reference parity: the einsum attention in cap4d/mmdm/net/attention.py:112-132
(fp32 softmax); numerically this is the same online-softmax algorithm the
flash_attn CUDA kernels implement.

Backward: wrapped in a custom_vjp whose backward recomputes through the
generic jax flash kernel — MMDM *training* keeps full gradients while the
hot inference path never pays for them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (kept for parity with sibling kernels)

_NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, sm_scale: float):
    q = q_ref[0]                                   # (BQ, D)
    bq, d = q.shape
    s_total = k_ref.shape[1]
    nk = s_total // bk
    # fold ln2 into the scale once and run the whole softmax in the exp2
    # domain — TPU's transcendental unit is exp2-native, so exp(x) costs an
    # extra multiply per element that this removes from the hot loop
    scale2 = sm_scale * 1.4426950408889634

    def scores(kb):
        k_blk = k_ref[0, pl.ds(kb * bk, bk), :]    # (BK, D)
        return jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2        # (BQ, BK)

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        s = scores(kb)                                          # (BQ, BK)
        v_blk = v_ref[0, pl.ds(kb * bk, bk), :]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)                                 # (BQ, BK)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (BQ, D)
        acc = acc * alpha + pv
        return m_new, l, acc

    _, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_fwd(q, k, v, block_q=512, block_k=1024, interpret=False):
    """(BH, S, D) forward-only flash attention; S % block sizes == 0.

    Scoped-VMEM budget (16 MB stack limit): the resident K/V block is
    s*d*2B each (double-buffered by the pipeline), and the kernel body's
    f32 score/softmax temporaries are ~3 * block_q * block_k * 4B. At
    block_q=1024/s=8192 that sums to ~16.3 MB and Mosaic refuses to
    compile; block_q=512 keeps the stack ~10 MB at every MMDM shape.
    """
    bh, s, d = q.shape
    while s % block_q:
        block_q //= 2
    while s % block_k:
        block_k //= 2
    grid = (bh, s // block_q)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bk=block_k, sm_scale=d ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),   # K: cached per b
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),   # V: cached per b
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _jax_flash(q4, k4, v4):
    """Generic pallas flash kernel on (B, H, S, D) — used for the backward."""
    from cap4d_tpu.ops.attention import _flash_fn

    return _flash_fn()(q4, k4, v4)


@jax.custom_vjp
def flash_attention_fwdopt(q, k, v):
    """(B, H, S, D) non-causal MHA; forward via the d=64-specialized kernel,
    backward via the generic flash kernel's VJP (recomputed)."""
    b, h, s, d = q.shape
    out = _flash_fwd(q.reshape(b * h, s, d), k.reshape(b * h, s, d),
                     v.reshape(b * h, s, d))
    return out.reshape(b, h, s, d)


def _fwdopt_fwd(q, k, v):
    return flash_attention_fwdopt(q, k, v), (q, k, v)


def _fwdopt_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_jax_flash, q, k, v)
    return vjp(g)


flash_attention_fwdopt.defvjp(_fwdopt_fwd, _fwdopt_bwd)


def supported(q_shape, dtype) -> bool:
    """This kernel handles the MMDM's attention shapes: d ≤ 128 and S a
    multiple of 512 (so 2048/4096/8192-token 3d sequences all hit it)."""
    *_, s, d = q_shape
    return d <= 128 and s >= 512 and s % 512 == 0
