"""Pallas TPU tile-compositing kernel for differentiable 3D Gaussian splatting.

This is the perf path of :mod:`cap4d_tpu.ops.gsplat` (the XLA sort-based
renderer remains as the CPU/test fallback). It replaces the CUDA
``gsplat.rendering.rasterization`` the reference wraps
(gaussianavatars/gaussian_renderer/gsplat_renderer.py:45-60) with a
TPU-native design:

  * XLA side: channelwise EWA projection + SH, budgeted three-level pair
    expansion (2×2 / mid / big windows assigned by span rank — one
    gaussian-level sort + static slices), ONE pair sort over a single fused
    int32 key (tile << rank_bits | exact-depth-rank) carrying a single
    value (the pair slot, which decodes to its gaussian with integer
    arithmetic), ONE row gather into depth-sorted order, and a transpose to
    a (10, m_pairs) channel-major array. No chunk alignment or padding
    happens in XLA — a profiled earlier revision spent 191 ms in a
    scalar-core searchsorted and 77 ms in a segmented re-copy doing that;
    the kernel addresses the sorted array directly.
  * Pallas forward: one grid step per 16×16 tile. The kernel walks the
    tile's pair segment [start, start+len) in CHUNK-column slices via
    double-buffered dynamic-offset HBM→VMEM DMA and composites
    front-to-back, carrying per-pixel log2-transmittance (exp2/log2 are the
    VPU-native transcendentals; a direct-product lane-scan formulation was
    measured and loses — see tools/bench_vpu_ops.py); the within-chunk
    exclusive prefix of log2(1−α) is a blocked pair of (PX,128)@(128,128)
    triangular matmuls + a broadcast carry on the MXU (half the MACs of the
    dense CHUNK² triangle). It terminates early once every pixel's
    transmittance falls
    below 1e-4 (the same threshold CUDA 3DGS uses) — there is NO per-tile
    gaussian cap, so nothing is silently truncated no matter how deep
    densification stacks a tile.
  * Pallas backward (custom VJP): front-to-back replay computing exact
    per-pair gradients (means2d, conic, opacity, color, depth) using the
    suffix-sum identity  dL/dα_k = T_k·q_k − (Σ_{j>k} w_j q_j)/(1−α_k),
    with the suffix obtained from the forward's accumulated totals minus a
    running prefix. Per-chunk gradient columns DMA back to HBM at the same
    dynamic offsets (the partial-tail overlap into the next tile's segment
    writes zeros and is overwritten by that tile's own step — grid steps
    drain their output DMAs before finishing, so the writes are ordered);
    the caller's custom-VJP unsort gather + dense per-region window
    reductions turn them into per-gaussian grads with no scatter anywhere,
    so densification's means2d grad statistics keep working unchanged.

Reference semantics matched: alpha threshold 1/255, alpha cap 0.999,
front-to-back over depth-sorted pairs, white-background compositing outside
the kernel (cf. gsplat rasterization "classic" mode with eps2d=0.3).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cap4d_tpu.ops.gsplat import (
    eval_sh_ch,
    project_gaussians_ch,
    project_gaussians_channels,
)

TILE = 16                 # pixels per tile side (PX = 256 pixels per tile)
CHUNK = 256               # gaussians composited per inner step (bigger chunks amortize
                          # the per-chunk DMA-wait/loop overhead; 128 measured ~1.6x slower)
NCH = 16                  # packed channel rows (10 used, padded to the 8-sublane tiling)
_LOG2_TERM = -13.28771238  # log2(1e-4): early-termination transmittance
_LN2 = 0.6931471805599453  # kernel-internal transmittance runs in log2
                           # (exp2/log2 are the VPU-native ops: measured 39/52
                           # vs 45/164 ns per (256,256) block for exp/log1p,
                           # tools/bench_vpu_ops.py); the logT OUTPUT column
                           # stays natural-log (converted once per tile)
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.999

# packed row layout (10 channels per pair)
# 0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c,
# 5 opacity, 6:9 rgb, 9 depth


def _tri(ch: int, inclusive: bool) -> jnp.ndarray:
    # bf16: 0/1 entries are exact, so the split-bf16 dot below loses nothing
    row = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return ((row <= col) if inclusive else (row < col)).astype(jnp.bfloat16)


def _dot_tri(a: jnp.ndarray, u16: jnp.ndarray) -> jnp.ndarray:
    """(PX, H) @ (H, H) triangular prefix in TWO bf16 MXU passes.

    ``Precision.HIGHEST`` costs 6 bf16 passes; because ``u16`` is exactly
    representable (0/1) a two-term split of ``a`` recovers ~16-17 mantissa
    bits (abs err ~2^-17·|Σ|, far inside the 5e-4 gradient-parity
    tolerance) at one third the MXU cost."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(a_hi, u16, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(a_lo, u16, dims,
                                  preferred_element_type=jnp.float32))


def _dot_tri_blk(a: jnp.ndarray, u_half: jnp.ndarray,
                 inclusive: bool) -> jnp.ndarray:
    """Blocked (PX, CHUNK) triangular prefix: two half-width _dot_tri calls
    plus a broadcast carry into the upper half.

    The dense CHUNK×CHUNK triangular matmul wastes half its MACs on the
    all-zero lower-left block; two (PX,128)@(128,128) halves + a (PX,1)
    carry add do the same prefix at half the MXU work — measured 287 vs
    387 ns per chunk (tools/bench_vpu_ops.py tri_blocked vs tri_matmul2;
    the 4-way split regresses to 578 ns on small-matmul overhead)."""
    h = CHUNK // 2
    lo, hi = a[:, :h], a[:, h:]
    p_lo = _dot_tri(lo, u_half)
    p_hi = _dot_tri(hi, u_half)
    if inclusive:
        carry = p_lo[:, h - 1:]                       # inclusive total of lo
    else:
        carry = p_lo[:, h - 1:] + lo[:, h - 1:]       # exclusive + last elem
    return jnp.concatenate([p_lo, p_hi + carry], axis=1)


def _dot_ones(x: jnp.ndarray) -> jnp.ndarray:
    """Column sums Σ_p x[p, :] as a (1, L) ones-row matmul in two bf16
    passes (split x; the ones row is exact), replacing VPU sublane-reduction
    trees with MXU work."""
    ones = jnp.ones((1, x.shape[0]), jnp.bfloat16)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(ones, x_hi, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ones, x_lo, dims,
                                  preferred_element_type=jnp.float32))


def _dot3(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """General-operand dot in THREE bf16 MXU passes (≈Precision.HIGH, which
    Mosaic does not lower in-kernel): a·b ≈ a_hi·b_hi + a_hi·b_lo + a_lo·b_hi,
    dropping only the ~2^-16-relative a_lo·b_lo term. Halves the MXU cost of
    the HIGHEST (6-pass) color matmuls."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dd = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                           preferred_element_type=jnp.float32)
    return dd(a_hi, b_hi) + dd(a_hi, b_lo) + dd(a_lo, b_hi)


def _chunk_fields(d):
    """Split a (10, CH) chunk into broadcast-ready (1, CH) rows."""
    return (d[0:1], d[1:2], d[2:3], d[3:4], d[4:5], d[5:6], d[6:9], d[9:10])


def _alpha_terms(d, px, py, colmask):
    """Shared forward math: returns (alpha, l=log2(1-alpha), fields...).

    l is LOG2: exp2/log2 are the VPU-native transcendentals (exp is exp2
    with a pre-scale; log1p measured 3× the cost of log). log2(1-α) loses
    nothing vs log1p(-α) here: kept alphas satisfy α ≥ 1/255, where 1-α is
    exact (Sterbenz for α ≥ 0.5) or ≤½ulp off, and masked lanes are exactly
    log2(1) = 0.

    colmask (1, CH) masks the partial tail of a tile's last chunk (those
    columns belong to the NEXT tile's segment in the unaligned layout)."""
    mean_x, mean_y, ca, cb, cc, opac, colors, depth = _chunk_fields(d)
    dx = px - mean_x                                   # (PX, CH)
    dy = py - mean_y
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    expneg = jnp.exp(-sigma)
    alpha_raw = opac * expneg
    keep = (sigma >= 0.0) & (alpha_raw >= _ALPHA_MIN) & colmask
    alpha = jnp.where(keep, jnp.minimum(alpha_raw, _ALPHA_MAX), 0.0)
    l = jnp.log2(1.0 - alpha)
    return alpha, l, dx, dy, expneg, alpha_raw, keep, colors, depth


def _pixel_coords(t, tiles_x):
    px_i = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)
    ox = (t % tiles_x) * TILE
    oy = (t // tiles_x) * TILE
    px = (ox + px_i % TILE).astype(jnp.float32) + 0.5
    py = (oy + px_i // TILE).astype(jnp.float32) + 0.5
    return px, py


def _lane():
    return jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)


def _fwd_kernel(bounds_ref, pairs_ref, out_ref, buf, sem, *, tiles_x):
    PX = TILE * TILE
    t = pl.program_id(0)
    s0 = bounds_ref[t]
    ln = bounds_ref[t + 1] - s0
    # Mosaic requires minor-dim DMA offsets provably divisible by the lane
    # tiling (128): slice at the aligned-down chunk base and mask the
    # out-of-segment columns on both ends instead
    c0 = s0 // CHUNK
    off0 = s0 - c0 * CHUNK
    nck = jnp.where(ln > 0, (off0 + ln + CHUNK - 1) // CHUNK, 0)
    px, py = _pixel_coords(t, tiles_x)
    u_half = _tri(CHUNK // 2, inclusive=False)
    lane = _lane()

    def dma(slot, j):
        return pltpu.make_async_copy(
            pairs_ref.at[:, pl.ds((c0 + j) * CHUNK, CHUNK)],
            buf.at[slot], sem.at[slot])

    @pl.when(nck > 0)
    def _():
        dma(0, 0).start()

    zero_px1 = jnp.zeros((PX, 1), jnp.float32)
    init = (0, jnp.float32(0.0), jnp.zeros((PX, 3), jnp.float32),
            zero_px1, zero_px1, zero_px1)

    def body(carry):
        j, _, rgb, wsum, dsum, logT = carry

        @pl.when(j + 1 < nck)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(j % 2, j).wait()
        d = buf[j % 2]
        g_pos = j * CHUNK + lane - off0          # position within the segment
        colmask = (g_pos >= 0) & (g_pos < ln)
        alpha, l, _, _, _, _, _, colors, depth = _alpha_terms(d, px, py, colmask)
        excl = _dot_tri_blk(l, u_half, inclusive=False)
        w = alpha * jnp.exp2(excl + logT)              # (PX, CH)
        # rgb + wsum + dsum in ONE matmul: ride two extra output lanes (a
        # ones row and the depth row) instead of two (PX,CH) lane reductions
        cmat = jnp.concatenate(
            [colors, jnp.ones((1, CHUNK), jnp.float32), depth], axis=0)
        acc = _dot3(w, cmat, (((1,), (1,)), ((), ())))  # (PX, 5)
        rgb = rgb + acc[:, 0:3]
        wsum = wsum + acc[:, 3:4]
        dsum = dsum + acc[:, 4:5]
        # Σ_j l_j = exclusive prefix at the last lane + the last lane itself
        logT = logT + excl[:, CHUNK - 1:] + l[:, CHUNK - 1:]
        return j + 1, jnp.max(logT), rgb, wsum, dsum, logT

    n_done, _, rgb, wsum, dsum, logT = jax.lax.while_loop(
        lambda c: (c[0] < nck) & (c[1] > _LOG2_TERM), body, init)

    # early termination exits with the next chunk's DMA already in flight —
    # it must be consumed before the kernel step ends (unwaited semaphore
    # ⇒ "TPU backend error (Internal)" at runtime)
    @pl.when(n_done < nck)
    def _():
        dma(n_done % 2, n_done).wait()

    out_ref[0] = jnp.concatenate(
        [rgb, wsum, dsum, logT * _LN2, jnp.zeros((PX, 2), jnp.float32)],
        axis=1)


def _bwd_kernel(bounds_ref, pairs_ref, fwd_out_ref, g_ref,
                dzero_ref, dpairs_ref, buf, gbuf, rbuf, sem, osem, rsem,
                *, tiles_x):
    """Replays the forward front-to-back, emitting per-pair gradient columns.

    dpairs is input/output-aliased with a zero array (dzero_ref) so segments
    never visited (early-terminated) keep zero gradients. Masked tail
    columns emit zero gradient rows; their DMA overlaps the next tile's
    segment but is overwritten by that tile's own (later, ordered) writes.
    """
    del dzero_ref
    PX = TILE * TILE
    t = pl.program_id(0)
    s0 = bounds_ref[t]
    ln = bounds_ref[t + 1] - s0
    c0 = s0 // CHUNK
    off0 = s0 - c0 * CHUNK
    nck = jnp.where(ln > 0, (off0 + ln + CHUNK - 1) // CHUNK, 0)
    px, py = _pixel_coords(t, tiles_x)
    u_half_i = _tri(CHUNK // 2, inclusive=True)
    u_half_e = _tri(CHUNK // 2, inclusive=False)
    lane = _lane()

    g_rgb = g_ref[0, :, 0:3]                            # (PX, 3)
    g_wsum = g_ref[0, :, 3:4]
    g_dsum = g_ref[0, :, 4:5]
    g_logT = g_ref[0, :, 5:6]
    # total Σ_j w_j q_j per pixel, from the forward's accumulated outputs
    s_total = (jnp.sum(fwd_out_ref[0, :, 0:3] * g_rgb, axis=1, keepdims=True)
               + fwd_out_ref[0, :, 3:4] * g_wsum
               + fwd_out_ref[0, :, 4:5] * g_dsum)

    def dma_in(slot, j):
        return pltpu.make_async_copy(
            pairs_ref.at[:, pl.ds((c0 + j) * CHUNK, CHUNK)],
            buf.at[slot], sem.at[slot])

    def dma_rd(slot, j):
        # read-modify-write: the aligned chunk can overlap the PREVIOUS
        # tile's segment tail, whose gradients were already written (grid
        # steps drain their DMAs before finishing, so the read sees them) —
        # accumulate instead of overwriting
        return pltpu.make_async_copy(
            dpairs_ref.at[:, pl.ds((c0 + j) * CHUNK, CHUNK)],
            rbuf.at[slot], rsem.at[slot])

    def dma_out(slot, j):
        return pltpu.make_async_copy(
            gbuf.at[slot], dpairs_ref.at[:, pl.ds((c0 + j) * CHUNK, CHUNK)],
            osem.at[slot])

    @pl.when(nck > 0)
    def _():
        dma_in(0, 0).start()
        dma_rd(0, 0).start()

    zero_px1 = jnp.zeros((PX, 1), jnp.float32)
    init = (0, jnp.float32(0.0), zero_px1, zero_px1)

    def body(carry):
        j, _, prefix, logT = carry

        @pl.when(j + 1 < nck)
        def _():
            dma_in((j + 1) % 2, j + 1).start()

        dma_in(j % 2, j).wait()
        d = buf[j % 2]
        g_pos = j * CHUNK + lane - off0
        colmask = (g_pos >= 0) & (g_pos < ln)
        (alpha, l, dx, dy, expneg, alpha_raw, keep,
         colors, depth) = _alpha_terms(d, px, py, colmask)
        ca, cb, cc = d[2:3], d[3:4], d[4:5]

        e = _dot_tri_blk(l, u_half_e, inclusive=False)  # exclusive prefix
        T = jnp.exp2(e + logT)
        w = alpha * T

        # q_k(p): sensitivity of the outputs to w_k at pixel p
        q = (_dot3(g_rgb, colors, (((1,), (0,)), ((), ())))
             + g_wsum + g_dsum * depth)                 # (PX, CH)
        wq = w * q
        incl = _dot_tri_blk(wq, u_half_i, inclusive=True)
        suffix = s_total - (prefix + incl)              # Σ_{j>k} w_j q_j
        d_alpha = T * q - (suffix + g_logT) / (1.0 - alpha)
        active = keep & (alpha_raw < _ALPHA_MAX)
        d_pre = jnp.where(active, d_alpha, 0.0)

        d_sigma = d_pre * (-alpha)
        gx = ca * dx + cb * dy
        gy = cc * dy + cb * dx
        # the seven (PX,CH)→(1,CH) pixel reductions as ONE 2-pass ones-row
        # matmul over lane-stacked integrands (sublane reduction trees on
        # (256,256) blocks are VPU-serial; the MXU does all seven in ~2
        # passes). Lane order matches the packed-row layout 0..5 + depth.
        integ = jnp.concatenate([
            d_sigma * (-gx),            # 0: d_mean_x
            d_sigma * (-gy),            # 1: d_mean_y
            d_sigma * (0.5 * dx * dx),  # 2: d_conic_a
            d_sigma * (dx * dy),        # 3: d_conic_b
            d_sigma * (0.5 * dy * dy),  # 4: d_conic_c
            d_pre * expneg,             # 5: d_opacity
            w * g_dsum,                 # 6: d_depth
        ], axis=1)                                      # (PX, 7*CH)
        sums = _dot_ones(integ)                         # (1, 7*CH)
        d_col = _dot3(g_rgb, w, (((0,), (0,)), ((), ())))   # (3, CH)

        slot = j % 2
        @pl.when(j >= 2)
        def _():
            dma_out(slot, j - 2).wait()
        dma_rd(slot, j).wait()
        # the j+1 accumulator read must come AFTER chunk j's columns are
        # final in HBM? No — chunks j and j+1 never overlap (disjoint
        # 128-column windows), so prefetching the read is safe
        @pl.when(j + 1 < nck)
        def _():
            dma_rd((j + 1) % 2, j + 1).start()
        gbuf[slot] = rbuf[slot] + jnp.concatenate(
            [sums[:, i * CHUNK:(i + 1) * CHUNK] for i in range(6)]
            + [d_col, sums[:, 6 * CHUNK:7 * CHUNK],
               jnp.zeros((NCH - 10, CHUNK), jnp.float32)], axis=0)
        dma_out(slot, j).start()

        # running sums from the prefixes' last lanes — no lane reductions
        prefix = prefix + incl[:, CHUNK - 1:]
        logT = logT + e[:, CHUNK - 1:] + l[:, CHUNK - 1:]
        return j + 1, jnp.max(logT), prefix, logT

    n_done, _, _, _ = jax.lax.while_loop(
        lambda c: (c[0] < nck) & (c[1] > _LOG2_TERM), body, init)

    # consume the in-flight input + accumulator DMAs left by early
    # termination (see fwd)
    @pl.when(n_done < nck)
    def _():
        dma_in(n_done % 2, n_done).wait()
        dma_rd(n_done % 2, n_done).wait()

    # drain output DMAs — ALSO orders this tile's tail-overlap zero writes
    # before the next grid step's real writes to the same region
    @pl.when(n_done >= 2)
    def _():
        dma_out((n_done - 2) % 2, n_done - 2).wait()

    @pl.when(n_done >= 1)
    def _():
        dma_out((n_done - 1) % 2, n_done - 1).wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_pairs_t(packed_cm, ext_ids, iperm, sorted_slot, counts):
    """(16, N) channel-major pack → (16, m_cap+CHUNK) channel-major sorted
    pairs — one LANE gather, no transposes.

    Pair slots live in up to four window-major regions (see the expansion in
    :func:`rasterize_gaussians_pallas`): the base_side×base_side base region
    addresses ALL N gaussians in ORIGINAL order (no permutation — a
    per-gaussian permutation gather of N-sized channel arrays lowers onto
    the TPU scalar core, profiled at ~1.7 ms per array), and the ext regions
    (2×2 / mid / big window complements) address nested prefixes of the
    span-compacted subset ``ext_ids``.

    The slot decodes to a column of ``concat([pack, pack[:, ext_ids]],
    axis=1)`` with pure integer arithmetic (all ext levels are prefixes of
    the same block, so ONE ext block suffices). A "direct" variant that
    decodes the slot to its original pack column via a 1-row s32 lookup
    through ``ext_ids`` — keeping the gather source at (16, n) — was
    measured SLOWER on the fit bench (14.1 vs 15.2 it/s): the extra
    m-sized index gather costs more than the larger-source gather saves.

    The pack arrays stay CHANNEL-MAJOR at the interface, but the take
    itself is phrased as a ROW gather on a transposed source — transpose,
    ``take(..., axis=0)`` of (m,16) rows, transpose back (and the backward
    unsort mirrors it). Round 2/3 measured persistent (m,16) row-major
    *intermediates* as 12-28 ms/step (8×-padded by the T(8,128) tiling,
    strided column-major gather fusions), but the transpose-bracketed row
    gather with optimization barriers measured 63.1 → 61.7 ms/step over the
    pure lane-gather phrasing: XLA fuses the transposes into the gather's
    layout assignment instead of materializing padded intermediates.

    Custom VJP: the plain gather's adjoint is a scatter-ADD over millions of
    entries with duplicate indices (TPU scalar core, measured 255 ms/step in
    round 2). Instead the backward un-sorts the cotangent with a lane
    GATHER (inverse permutation carried from the forward), reduces each
    ext region's window axis densely, accumulates the (nested-prefix)
    region sums in E_top-compacted space, and folds them back with ONE
    masked lane gather through ``iperm``; the base region lands directly in
    original order. No scatter anywhere. Lane-gather cost on TPU is
    per-gathered-byte and per-index, so training configs use a 1×1 base
    (L0=1): inactive capacity padding and span-1 splats then cost one pair
    slot instead of four in the backward's m-sized unsort gather.

    counts = (n, L0, rungs, m_cap): base offset count, a tuple of
    (E_k, L_k) ext-rung region sizes in ascending-window order (nested
    prefixes of ``ext_ids``: E_1 ⊇ E_2 ⊇ …), and the valid-prefix cap
    (all static)."""
    n, L0, rungs, m_cap = counts
    slots = sorted_slot[:m_cap]
    e_top = max((Ek for Ek, _ in rungs), default=0)
    idx = slots % n if L0 > 1 else slots                  # base region
    c = L0 * n
    for Ek, Lk in rungs:
        if Ek and Lk:
            idx = jnp.where(slots >= c, n + (slots - c) % Ek, idx)
            c += Lk * Ek
    # ONE zero column appended to the source + CHUNK index-pad columns, then
    # the take phrased as a ROW gather (transpose either side): measured
    # 63.1 → 61.7 ms/step on the fit bench. Layout-pinning the row-major
    # intermediates harder (pallas repack custom calls on both sides) was
    # measured WORSE (71 ms/step — XLA inserts relayout copies and a
    # separate clip-mask select); this phrasing is the measured optimum.
    zcol = packed_cm.shape[1] + (ext_ids.shape[0] if e_top else 0)
    pe = (jnp.concatenate(
        [packed_cm, jnp.take(packed_cm, ext_ids, axis=1),
         jnp.zeros((NCH, 1), packed_cm.dtype)], axis=1)
        if e_top else jnp.concatenate(
            [packed_cm, jnp.zeros((NCH, 1), packed_cm.dtype)], axis=1))
    idx = jnp.concatenate(
        [idx, jnp.full((CHUNK,), zcol, jnp.int32)])
    src, idx = jax.lax.optimization_barrier((pe, idx))
    rows = jnp.take(jnp.transpose(src), idx, axis=0)     # (m_cap+CHUNK, 16)
    rows = jax.lax.optimization_barrier(rows)
    return jnp.transpose(rows)                           # (16, m_cap+CHUNK)


def _gather_pairs_t_fwd(packed_cm, ext_ids, iperm, sorted_slot, counts):
    out = _gather_pairs_t(packed_cm, ext_ids, iperm, sorted_slot, counts)
    # inverse pair permutation computed HERE, next to the main pair sort:
    # the same sort issued from the backward segment lowered onto the
    # scalar core (4 async S(1) slices, ~58 ms/step in the round-3 trace)
    m = sorted_slot.shape[0]
    _, inv = jax.lax.sort_key_val(
        sorted_slot, jax.lax.iota(jnp.int32, m))          # inv[p] = sorted pos
    return out, (iperm, inv)


def _gather_pairs_t_bwd(counts, res, g):
    iperm, inv = res
    n, L0, rungs, m_cap = counts
    # pairs past the valid-prefix cap carry zero gradient (never composited):
    # pad one zero ROW and clamp the inverse permutation. The whole unsort
    # runs in the row-major formulation (see _gather_pairs_t): the row
    # gather + window reductions over (slots, 16) rows measured 7.2 →
    # 5.3 ms/step at 1.16M slots vs the channel-major lane gather this
    # replaced (per-index lane-tile addressing beats per-row bytes).
    g_rows = jnp.concatenate(
        [jnp.transpose(g[:, :m_cap]), jnp.zeros((1, NCH), g.dtype)], axis=0)
    g_rows = jax.lax.optimization_barrier(g_rows)
    sel = jnp.where(inv < m_cap, inv, m_cap)
    u = jnp.take(g_rows, sel, axis=0)                     # (m, 16) row gather
    u = jax.lax.optimization_barrier(u)
    d = (u[:L0 * n].reshape(L0, n, NCH).sum(axis=0) if L0 > 1
         else u[:n])                                      # base: orig order
    e_top = max((Ek for Ek, _ in rungs), default=0)
    if e_top:
        # window-reduce each ext region, accumulate in compacted space
        # (regions are nested prefixes), then ONE fold gather through iperm
        c = L0 * n
        fold = jnp.zeros((e_top, NCH), u.dtype)
        for Ek, Lk in rungs:
            if Ek and Lk:
                dk = u[c:c + Lk * Ek].reshape(Lk, Ek, NCH).sum(axis=0)
                fold = fold.at[:Ek].add(dk) if Ek < e_top else fold + dk
                c += Lk * Ek
        fold = jnp.concatenate(
            [fold, jnp.zeros((1, NCH), fold.dtype)], axis=0)
        sel1 = jnp.where(iperm < e_top, iperm, e_top)
        d = d + jnp.take(fold, sel1, axis=0)
    return jnp.transpose(d), None, None, None


_gather_pairs_t.defvjp(_gather_pairs_t_fwd, _gather_pairs_t_bwd)


@functools.lru_cache(maxsize=None)
def _make_composite(n_tiles: int, tiles_x: int, m_padded: int, interpret: bool):
    """Composite fwd/bwd over a (10, m_padded) channel-major sorted pair
    array; per-tile segments addressed by prefetched starts/lens."""
    PX = TILE * TILE
    grid_fwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, PX, 8), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x),
        grid_spec=grid_fwd,
        out_shape=jax.ShapeDtypeStruct((n_tiles, PX, 8), jnp.float32),
        interpret=interpret,
    )

    grid_bwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # pairs (10, m_padded)
            pl.BlockSpec((1, PX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # fwd out
            pl.BlockSpec((1, PX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # cotangent
            pl.BlockSpec(memory_space=pl.ANY),          # zeros (aliased out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),   # buf (pairs in)
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),   # gbuf (grads out)
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),   # rbuf (accumulator in)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x),
        grid_spec=grid_bwd,
        out_shape=jax.ShapeDtypeStruct((NCH, m_padded), jnp.float32),
        input_output_aliases={4: 0},  # zeros input (after the prefetch arg) → dpairs
        interpret=interpret,
    )

    @jax.custom_vjp
    def composite(pairs_t, bounds):
        return fwd_call(bounds, pairs_t)

    def composite_fwd(pairs_t, bounds):
        out = composite(pairs_t, bounds)
        return out, (pairs_t, bounds, out)

    def composite_bwd(res, g):
        pairs_t, bounds, out = res
        dzero = jnp.zeros_like(pairs_t)
        dpairs = bwd_call(bounds, pairs_t, out, g, dzero)
        return dpairs, None

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "sh_degree", "max_tiles_per_gaussian", "render_depth",
    "big_tiles_per_gaussian", "big_budget", "mid_budget", "small_budget",
    "base_side", "max_valid_pairs", "interpret"))
def rasterize_gaussians_pallas(
    means3d: jnp.ndarray,     # (N, 3) world
    quats: jnp.ndarray,       # (N, 4) wxyz
    scales: jnp.ndarray,      # (N, 3) world-space scales (post-activation)
    opacities: jnp.ndarray,   # (N,)
    sh_colors: jnp.ndarray,   # (N, K, 3)
    viewmat: jnp.ndarray,     # (4, 4) world→cam
    K: jnp.ndarray,           # (3, 3)
    width: int,
    height: int,
    sh_degree: int = 3,
    background: Optional[jnp.ndarray] = None,
    near: float = 0.01,
    far: float = 1e10,
    max_tiles_per_gaussian: int = 16,
    render_depth: bool = False,
    means2d_offset: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    big_tiles_per_gaussian: int = 49,
    big_budget: int = 0,
    mid_budget: int = 0,
    small_budget: int = 0,
    base_side: int = 2,
    max_valid_pairs: Optional[int] = None,
    channels: Optional[Dict[str, tuple]] = None,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Pallas-path rasterizer; same contract as gsplat.rasterize_gaussians
    minus the per-tile cap (`max_per_tile` does not exist here: compositing
    is exact for any overlap depth).

    Footprint handling is up-to-four-level and budgeted by span rank: every
    gaussian gets a base_side×base_side base window, the `small_budget`
    largest-span gaussians beyond that get the 2×2 complement (only when
    base_side == 1), the `mid_budget` next a side×side
    (max_tiles_per_gaussian) window, and the `big_budget` largest a
    big_side×big_side window (a handful of large background splats would
    otherwise force the quadratically bigger window, and a recompile, onto
    all N). Budgets of 0 mean auto (5n/8, n/32, n/128 — sized so an
    all-active densified scene of mostly span-2 splats fits with margin).
    Only splats whose span exceeds their rank-assigned window are clipped,
    reported via n_truncated.

    base_side picks the slot-count / gather-overhead trade per path:
      * 2 (default): span ≤ 2 is exact with NO budget — best for
        forward-only rendering of dense all-active scenes, where the extra
        base slots are cheap (one sort key each) and ext machinery is tiny.
      * 1: training. The VJP's unsort gather and the two m-sized sorts pay
        ~12 ns per window SLOT, so inactive capacity padding and span-1
        splats emitting 4 base slots dominate the fit step; a 1×1 base with
        a budgeted 2×2 ext level measured 1.84M → 1.1M slots and
        13.5 → 15.2 fit it/s on the honest fit bench."""
    if channels is not None:
        # channel-tuple inputs (world_gaussians_pack): skip all minor-dim
        # slicing; quat channels must already be unit
        m_ch = channels["means3d_ch"]
        q_ch = channels["quats_ch"]
        s_ch = channels["scales_ch"]
        n = m_ch[0].shape[0]
    else:
        n = means3d.shape[0]
    if background is None:
        background = jnp.ones(3, jnp.float32)
    side = int(max_tiles_per_gaussian ** 0.5)

    if channels is not None:
        ch = project_gaussians_channels(m_ch, q_ch, s_ch, viewmat, K,
                                        width, height, near, far)
    else:
        ch = project_gaussians_ch(means3d, quats, scales, viewmat, K,
                                  width, height, near, far)
        m_ch = (means3d[:, 0], means3d[:, 1], means3d[:, 2])
    mean_x, mean_y = ch["mean_x"], ch["mean_y"]
    radius, valid, depth = ch["radius"], ch["valid"], ch["depth"]
    if mask is not None:
        valid = valid & mask
        radius = jnp.where(mask, radius, 0.0)
    if means2d_offset is not None:
        mean_x = mean_x + means2d_offset[:, 0]
        mean_y = mean_y + means2d_offset[:, 1]

    cam_pos = -jnp.matmul(viewmat[:3, :3].T, viewmat[:3, 3],
                          precision=jax.lax.Precision.HIGHEST)
    dx = m_ch[0] - cam_pos[0]
    dy = m_ch[1] - cam_pos[1]
    dz = m_ch[2] - cam_pos[2]
    dn = jnp.clip(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
    colors = jnp.clip(
        eval_sh_ch(sh_colors, dx / dn, dy / dn, dz / dn, sh_degree)
        + 0.5, 0.0)                                     # (3, N)

    # channel-major pack (compact, N on lanes) — 16 rows: 10 used channels
    # padded to the 8-sublane tiling the kernel DMA needs
    packed_cm = jnp.concatenate([jnp.stack([
        mean_x, mean_y, ch["conic_a"], ch["conic_b"], ch["conic_c"],
        opacities, colors[0], colors[1], colors[2], depth,
    ], axis=0), jnp.zeros((NCH - 10, n), jnp.float32)], axis=0)  # (16, N)

    # ---- budgeted complement-window pair expansion + ONE 1-key sort ----
    # Every gaussian emits a base_side×base_side BASE window in ORIGINAL
    # order (no per-gaussian permutation: N-sized permutation gathers lower
    # onto the TPU scalar core). The `small_budget` (base_side 1 only) +
    # `mid_budget` + `big_budget` largest-span gaussians, compacted by one
    # N-sort into nested prefixes, additionally emit the COMPLEMENT offsets
    # of a 2×2 / side×side / big_side×big_side window (offset sets are
    # disjoint, so base ∪ ext levels tile a full window). A 1×1 base
    # matters for TRAINING because every pair SLOT — dead or alive — costs
    # sort keys and ~12 ns/column in the VJP's unsort gather: inactive
    # capacity padding and span-1 splats stop paying a 4-slot 2×2 window
    # (measured 1.84M → 1.1M slots on the honest fit bench); for
    # forward-only rendering of dense all-active scenes the 2×2 base is
    # faster (no E1-sized ext machinery). The pair sort carries ONE int32
    # key (tile << rank_bits | exact depth rank) + ONE value (the pair
    # slot, which decodes to its gaussian by integer arithmetic) instead
    # of round 2's 2-key/4-array sort (~45 ms/step at 3.5M pairs).
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    n_tiles = tiles_x * tiles_y
    # alpha-bound tile cull radius: the kernel zeroes any pair-pixel with
    # alpha_raw = opac·exp(-σ) < _ALPHA_MIN, and σ ≥ ½·λ_min(conic)·r² for a
    # pixel at distance r from the mean — so a tile whose NEAREST rect point
    # sits beyond r²_cut = 2·log(opac/_ALPHA_MIN)/λ_min can never pass the
    # keep mask and is culled EXACTLY (pixel centers are ≥ the rect
    # distance, so the bound is conservative). Bbox corner tiles and the
    # whole footprint of sub-1/255-opacity splats (r²_cut < 0) drop out of
    # the pair list ~15-25% before the sort/gather/composite.
    lam_min = (0.5 * (ch["conic_a"] + ch["conic_c"])
               - jnp.sqrt(0.25 * (ch["conic_a"] - ch["conic_c"]) ** 2
                          + ch["conic_b"] ** 2))
    r2_cut = (2.0 * jnp.log(jnp.maximum(opacities, 1e-30) / _ALPHA_MIN)
              / jnp.maximum(lam_min, 1e-12))
    tx0 = jnp.floor((mean_x - radius) / TILE).astype(jnp.int32)
    ty0 = jnp.floor((mean_y - radius) / TILE).astype(jnp.int32)
    tx1 = jnp.floor((mean_x + radius) / TILE).astype(jnp.int32)
    ty1 = jnp.floor((mean_y + radius) / TILE).astype(jnp.int32)
    span = jnp.maximum(tx1 - tx0, ty1 - ty0) + 1

    big_side = int(big_tiles_per_gaussian ** 0.5)
    base = max(1, min(base_side, side, 2))

    def _auto(budget, frac, quantum):
        # 0 = auto: a capacity fraction rounded up to a recompile-stable
        # quantum (fractions sized from the honest fit-bench span census:
        # ~90% of active splats straddle into a 2×2, <0.2% past it)
        if budget:
            return budget
        return max(quantum, -(-int(n * frac) // quantum) * quantum)

    # ---- window-size LADDER ----
    # One side×side complement window per span class, every 2 tiles of side:
    # the round-4 two-window design (one `side` window for ALL span>2
    # splats, one big window above it) paid side²−4 slots — 45 at side 7 —
    # for every mid splat regardless of its real span, and every dead slot
    # costs sort keys plus ~6 ns in the VJP's m-sized unsort gather. Rung
    # budgets halve ladder-upward from the small/mid/big anchors (span
    # populations decay faster than that — footprint area grows ×4 per
    # rung); a splat past its rung's budget falls into the next smaller
    # rung's prefix and is CLIPPED + counted in n_truncated, so undersized
    # rungs self-heal through the cap-growth reaction exactly as before.
    small_sides = [2] if (base == 1 and max(side, big_side) >= 2) else []
    mid_sides = [s for s in range(3, side + 1, 2) if s > 2]
    if side > 2 and side % 2 == 0:
        mid_sides = [s for s in mid_sides if s < side] + [side]
    prev_mid = mid_sides[-1] if mid_sides else (2 if small_sides or base >= 2
                                                else base)
    big_sides = [s for s in range(prev_mid + 2, big_side + 1, 2)]
    if big_side > prev_mid and (not big_sides or big_sides[-1] != big_side):
        big_sides = [s for s in big_sides if s < big_side] + [big_side]

    small_anchor = _auto(small_budget, 5 / 8, 512) if small_sides else 0
    mid_anchor = _auto(mid_budget, 1 / 32, 512) if mid_sides else 0
    big_anchor = _auto(big_budget, 1 / 128, 256) if big_sides else 0

    def _partition(anchor, k, quantum):
        """Split an anchor budget over its k ladder rungs: geometric halves
        (span populations decay at least that fast — footprint area grows
        ×4 per rung), REMAINDER ON THE LAST RUNG so a tiny explicit budget
        keeps the old guarantee that the largest-span splats get the full
        window. Rung populations sum to the anchor: total coverage keeps
        the round-4 two-window semantics while per-splat windows shrink."""
        if k <= 1:
            return [anchor]
        parts, left = [], anchor
        for i in range(k - 1):
            p = anchor >> (i + 1)
            if p >= quantum:
                p = -(-p // quantum) * quantum
            p = min(p, left)
            parts.append(p)
            left -= p
        parts.append(left)
        return parts

    # per-rung POPULATION budgets (splats whose span lands in that rung),
    # then nested prefix sizes E_k as suffix sums — a big splat occupies
    # every rung's prefix (its full window = base ∪ all complement levels),
    # mirroring the round-4 cumulative E2 = E3 + mid semantics
    rung_sides, rung_P = [], []
    for s in small_sides:
        rung_sides.append(s)
        rung_P.append(small_anchor)
    for s, P in zip(mid_sides, _partition(mid_anchor, len(mid_sides), 512)):
        rung_sides.append(s)
        rung_P.append(P)
    for s, P in zip(big_sides, _partition(big_anchor, len(big_sides), 256)):
        rung_sides.append(s)
        rung_P.append(P)
    rung_E, suffix = [], 0
    for P in reversed(rung_P):
        suffix += P
        rung_E.append(min(suffix, n))
    rung_E.reverse()

    def offs(sd, inner):
        return [(i, j) for i in range(sd) for j in range(sd)
                if not (i < inner and j < inner)]

    base_offs = offs(base, 0)
    prev = [base] + rung_sides[:-1]
    rung_offs = [offs(s, p) for s, p in zip(rung_sides, prev)]
    L0 = len(base_offs)
    rung_L = [len(o) for o in rung_offs]

    # exact global depth order as an integer rank (no quantization): two
    # N-sorts; ties broken deterministically by gaussian index
    iota_n = jax.lax.iota(jnp.int32, n)
    _, order = jax.lax.sort_key_val(depth, iota_n)
    _, rank = jax.lax.sort_key_val(order, iota_n)
    rank_bits = max((n - 1).bit_length(), 1)
    assert (n_tiles + 1) << rank_bits < 2 ** 31, \
        "fused sort key overflows int32 (tiles × gaussians too large)"

    # compact the largest-span gaussians: level desc, span desc, index asc
    span_eff = jnp.where(valid, span, 1)
    e_top = max(rung_E, default=0)
    if e_top:
        level = jnp.zeros_like(span_eff)
        for s, p in zip(rung_sides, [base] + rung_sides[:-1]):
            level += (span_eff > p).astype(jnp.int32)
        ckey = -(level * 4096 + jnp.minimum(span_eff, 4095))
        _, perm = jax.lax.sort_key_val(ckey, iota_n)
        _, iperm = jax.lax.sort_key_val(perm, iota_n)
        ext_ids = perm[:e_top]
    else:
        iperm = iota_n
        ext_ids = iota_n[:0]

    # pack the per-gaussian window channels once so ext regions need ONE
    # small row gather instead of per-array scalar-core gathers (float
    # channels ride bitcast in the same int32 pack)
    win_pack = jnp.stack(
        [tx0, ty0, tx1, ty1, rank, valid.astype(jnp.int32),
         jax.lax.bitcast_convert_type(mean_x, jnp.int32),
         jax.lax.bitcast_convert_type(mean_y, jnp.int32),
         jax.lax.bitcast_convert_type(r2_cut, jnp.int32),
         jnp.zeros_like(tx0)], axis=1)                      # (N, 10)

    def window_keys(off_list, x0, y0, x1, y1, rk, vld, mx, my, r2c):
        """(L, E) fused sort keys from (E,) window channel vectors."""
        oa = jnp.asarray(np.array(off_list, np.int32))
        cy = y0[None, :] + oa[:, 0:1]
        cx = x0[None, :] + oa[:, 1:2]
        ok = (vld[None, :]
              & (cx >= 0) & (cx < tiles_x) & (cy >= 0) & (cy < tiles_y)
              & (cx <= x1[None, :]) & (cy <= y1[None, :]))
        # exact alpha-bound cull (see r2_cut above): distance from the mean
        # to the tile's pixel rect, zero when the mean is inside
        tlx = (cx * TILE).astype(jnp.float32)
        tly = (cy * TILE).astype(jnp.float32)
        ddx = jnp.maximum(jnp.maximum(tlx - mx[None, :],
                                      mx[None, :] - (tlx + TILE)), 0.0)
        ddy = jnp.maximum(jnp.maximum(tly - my[None, :],
                                      my[None, :] - (tly + TILE)), 0.0)
        ok = ok & (ddx * ddx + ddy * ddy <= r2c[None, :])
        tile = cy * tiles_x + cx
        return jnp.where(ok, (tile << rank_bits) | rk[None, :],
                         n_tiles << rank_bits)

    # base region: original order, original 1-D channel vectors — no gather
    key_parts = [window_keys(base_offs, tx0, ty0, tx1, ty1,
                             rank, valid, mean_x, mean_y, r2_cut).reshape(-1)]
    if e_top:
        wp_ext = win_pack[ext_ids]                      # (E_top, 10) row gather
        ext_ch = (tuple(wp_ext[:, i] for i in range(5))
                  + (wp_ext[:, 5] > 0,)
                  + tuple(jax.lax.bitcast_convert_type(wp_ext[:, i],
                                                       jnp.float32)
                          for i in (6, 7, 8)))
        for Ek, ok in zip(rung_E, rung_offs):
            if Ek:
                key_parts.append(window_keys(
                    ok, *(c[:Ek] for c in ext_ch)).reshape(-1))
    key_all = jnp.concatenate(key_parts) if len(key_parts) > 1 else key_parts[0]
    m_pairs = key_all.shape[0]
    sorted_key, sorted_slot = jax.lax.sort_key_val(
        key_all, jax.lax.iota(jnp.int32, m_pairs))

    # a splat whose span exceeds its rank-assigned window is clipped:
    # ascending-rung overwrite picks the LARGEST rung whose nested prefix
    # contains the splat
    assigned = jnp.full_like(span, base)
    for s, Ek in zip(rung_sides, rung_E):
        if Ek:
            assigned = jnp.where(iperm < Ek, s, assigned)
    n_truncated = jnp.sum(valid & (span > assigned))

    # ---- per-tile segment table + channel-major sorted pair array ----
    # n_tiles-many searchsorted queries INTO the big array (the cheap
    # direction); ONE row gather; ONE transpose. CHUNK extra zero columns
    # keep the last tile's final partial-chunk DMA in bounds.
    tids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_key, tids << rank_bits,
                              side="left").astype(jnp.int32)

    # valid-prefix cap: invalid pairs sort to the tail, so only the first
    # m_cap sorted pairs need materializing for the kernel; segments beyond
    # the cap are clipped (counted in n_truncated_depth so callers can grow
    # the cap, like the XLA path's max_per_tile)
    if max_valid_pairs and max_valid_pairs < m_pairs:  # 0/None = uncapped
        m_cap = max(CHUNK, max_valid_pairs)
        n_overflow = jnp.maximum(bounds[-1] - m_cap, 0)
        bounds = jnp.minimum(bounds, m_cap)
    else:
        m_cap = m_pairs
        n_overflow = jnp.zeros((), jnp.int32)

    counts = (n, L0, tuple(zip(rung_E, rung_L)), m_cap)
    pairs_t = _gather_pairs_t(packed_cm, ext_ids, iperm, sorted_slot, counts)

    composite = _make_composite(n_tiles, tiles_x, m_cap + CHUNK, interpret)
    out = composite(pairs_t, bounds)                      # (n_tiles, PX, 8)

    T = jnp.exp(out[..., 5])                              # (n_tiles, PX)
    rgb_tiles = out[..., 0:3] + T[..., None] * background[None, None]
    alpha_tiles = 1.0 - T

    def tiles_to_image(tiles, chn):
        img = tiles.reshape(tiles_y, tiles_x, TILE, TILE, chn)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y * TILE, tiles_x * TILE, chn)
        return img[:height, :width]

    result = {
        "render": tiles_to_image(
            rgb_tiles.reshape(n_tiles, TILE * TILE, 3), 3),
        "alpha": tiles_to_image(
            alpha_tiles.reshape(n_tiles, TILE * TILE)[..., None], 1)[..., 0],
        "radii": radius,
        "means2d": jnp.stack([mean_x, mean_y], axis=-1),
        "visibility": valid & (radius > 0),
        "n_truncated": n_truncated,
        # compositing is exact at any overlap depth (no per-tile cap); only
        # a max_valid_pairs overflow clips, reported like a depth cap
        "n_truncated_depth": n_overflow,
    }
    if render_depth:
        depth_tiles = out[..., 4] / jnp.clip(alpha_tiles, 1e-10)
        result["depth"] = tiles_to_image(
            depth_tiles.reshape(n_tiles, TILE * TILE)[..., None], 1)[..., 0]
    return result
