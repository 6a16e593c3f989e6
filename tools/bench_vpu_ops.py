"""Microbenchmark: per-op VPU/MXU costs inside a pallas chunk loop.

Decides the round-4 composite-kernel question (VERDICT item 3): log-domain
compositing pays exp + log1p + exp per pair-pixel plus a triangular-matmul
prefix; a direct-product formulation pays ONE exp plus a multiplicative
lane scan (log2(CHUNK) pltpu.roll+select+mul steps). Whether that trade wins
depends on the v5e's real transcendental and lane-rotate throughputs, which
this tool measures in the kernel's own structure: a serial while-loop over
(256, 256) f32 blocks resident in VMEM (no DMA), NITER iterations, one
scalar fetched.

Each case times `base` (loop + carry + one mul) plus K extra ops; cost(op) =
(t_case - t_base) / NITER / K.

Usage:  python tools/bench_vpu_ops.py
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PX, CH = 256, 256
NITER = 262144
K = 4  # extra-op repetitions per iteration


def make_loop(body_extra):
    """pallas kernel: serial while loop; body = carry-mul + body_extra."""

    def kernel(x_ref, o_ref):
        x = x_ref[...]

        def body(c):
            j, acc = c
            acc = body_extra(acc, x, j)
            return j + 1, acc

        _, acc = jax.lax.while_loop(lambda c: c[0] < NITER, body,
                                    (0, x * 0.5))
        o_ref[...] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((PX, CH), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def tri(ch, inclusive):
    row = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return ((row <= col) if inclusive else (row < col)).astype(jnp.bfloat16)


CASES = {}


def case(name):
    def deco(fn):
        CASES[name] = fn
        return fn
    return deco


@case("base")
def _base(acc, x, j):
    return acc * 0.999999 + 1e-9


@case("mul")
def _mul(acc, x, j):
    for _ in range(K):
        acc = acc * x
    return acc * 0.999999 + 1e-9


@case("exp")
def _exp(acc, x, j):
    for _ in range(K):
        acc = jnp.exp(-jnp.abs(acc))
    return acc * 0.999999 + 1e-9


@case("log1p")
def _log1p(acc, x, j):
    for _ in range(K):
        acc = jnp.log1p(jnp.minimum(jnp.abs(acc), 0.9))
    return acc * 0.999999 + 1e-9


@case("roll_sel_mul")
def _roll(acc, x, j):
    lane = jax.lax.broadcasted_iota(jnp.int32, (PX, CH), 1)
    for s in (1, 2, 4, 8):
        r = pltpu.roll(acc, s, axis=1)
        acc = acc * jnp.where(lane < s, 1.0, r)
    return acc * 0.999999 + 1e-9


@case("scan8")  # the full 256-lane exclusive product scan (8 H-S steps)
def _scan(acc, x, j):
    lane = jax.lax.broadcasted_iota(jnp.int32, (PX, CH), 1)
    p = jnp.where(lane < 1, 1.0, pltpu.roll(acc, 1, axis=1))
    for s in (1, 2, 4, 8, 16, 32, 64, 128):
        p = p * jnp.where(lane < s, 1.0,
                          pltpu.roll(p, s, axis=1))
    return acc * 0.999999 + p * 1e-12


@case("log")
def _log(acc, x, j):
    for _ in range(K):
        acc = jnp.log(jnp.abs(acc) + 0.5)
    return acc * 0.999999 + 1e-9


@case("exp2")
def _exp2(acc, x, j):
    for _ in range(K):
        acc = jnp.exp2(-jnp.abs(acc))
    return acc * 0.999999 + 1e-9


@case("div")
def _div(acc, x, j):
    for _ in range(K):
        acc = acc / (jnp.abs(x) + 1.001)
    return acc * 0.999999 + 1e-9


@case("where")
def _where(acc, x, j):
    for _ in range(K):
        acc = jnp.where(x > 0.5, acc, acc * 0.5)
    return acc * 0.999999 + 1e-9


@case("acc_matmul3")  # the fwd w@cmat accumulate: 3-pass (PX,CH)@(CH,5)
def _accm(acc, x, j):
    cmat = jnp.concatenate(
        [x[0:3], jnp.ones((1, CH), jnp.float32), x[3:4]], axis=0)
    dims = (((1,), (1,)), ((), ()))
    a_hi = acc.astype(jnp.bfloat16)
    a_lo = (acc - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = cmat.astype(jnp.bfloat16)
    b_lo = (cmat - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dd = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                           preferred_element_type=jnp.float32)
    out = dd(a_hi, b_hi) + dd(a_hi, b_lo) + dd(a_lo, b_hi)  # (PX, 5)
    return acc * 0.999999 + jnp.sum(out, axis=1, keepdims=True) * 1e-12


@case("acc_matmul2")  # 2-pass variant (split acc only; cmat taken exact-ish)
def _accm2(acc, x, j):
    cmat = jnp.concatenate(
        [x[0:3], jnp.ones((1, CH), jnp.float32), x[3:4]], axis=0)
    dims = (((1,), (1,)), ((), ()))
    a_hi = acc.astype(jnp.bfloat16)
    a_lo = (acc - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = cmat.astype(jnp.bfloat16)
    dd = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                           preferred_element_type=jnp.float32)
    out = dd(a_hi, b_hi) + dd(a_lo, b_hi)  # (PX, 5)
    return acc * 0.999999 + jnp.sum(out, axis=1, keepdims=True) * 1e-12


@case("tri_matmul2")  # the split-bf16 2-pass (PX,CH)@(CH,CH) prefix
def _tri2(acc, x, j):
    u = tri(CH, False)
    dims = (((1,), (0,)), ((), ()))
    for _ in range(1):
        a_hi = acc.astype(jnp.bfloat16)
        a_lo = (acc - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (jax.lax.dot_general(a_hi, u, dims,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(a_lo, u, dims,
                                     preferred_element_type=jnp.float32))
    return acc * 1e-6 + 0.5


@case("tri_blocked")  # 2-level prefix: two (PX,128)@(128,128) halves + carry
def _tri_blk(acc, x, j):
    u = tri(128, False)
    dims = (((1,), (0,)), ((), ()))

    def half(a):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jax.lax.dot_general(a_hi, u, dims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(a_lo, u, dims,
                                      preferred_element_type=jnp.float32))

    lo, hi = acc[:, :128], acc[:, 128:]
    e_lo = half(lo)
    e_hi = half(hi) + (e_lo[:, 127:128] + lo[:, 127:128])
    acc = jnp.concatenate([e_lo, e_hi], axis=1)
    return acc * 1e-6 + 0.5


@case("tri_blocked4")  # 4-level: four (PX,64)@(64,64) + cascaded carries
def _tri_blk4(acc, x, j):
    u = tri(64, False)
    dims = (((1,), (0,)), ((), ()))

    def q(a):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jax.lax.dot_general(a_hi, u, dims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(a_lo, u, dims,
                                      preferred_element_type=jnp.float32))

    parts, carry, outs = [acc[:, i * 64:(i + 1) * 64] for i in range(4)], None, []
    for p in parts:
        e = q(p)
        if carry is not None:
            e = e + carry
        tot = e[:, 63:64] + p[:, 63:64]
        carry = tot
        outs.append(e)
    acc = jnp.concatenate(outs, axis=1)
    return acc * 1e-6 + 0.5


def main():
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0.1, 0.9, (PX, CH)).astype(np.float32))
    results = {}
    for name, fn in CASES.items():
        run = jax.jit(make_loop(fn))
        np.asarray(run(x))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x))
            ts.append(time.perf_counter() - t0)
        results[name] = min(ts)
    base = results["base"]
    print(f"{'case':14s} {'total_ms':>9s} {'ns/iter':>9s} {'ns/op':>8s}")
    per_case_ops = {"mul": K, "exp": K, "log1p": K, "log": K, "exp2": K,
                    "div": K, "where": K, "roll_sel_mul": 4,
                    "scan8": 9, "tri_matmul2": 1}
    for name, t in results.items():
        extra = (t - base) / NITER * 1e9
        nop = per_case_ops.get(name, 1)
        print(f"{name:14s} {t*1e3:9.2f} {extra:9.1f} {extra/nop:8.1f}")
    print(f"(base loop: {base*1e3:.2f} ms total, "
          f"{base/NITER*1e9:.0f} ns/iter)")


if __name__ == "__main__":
    main()
