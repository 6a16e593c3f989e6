"""MMDM UNet in Flax (NHWC, TPU-native).

Reference parity:
  controlnet/ldm/modules/diffusionmodules/openaimodel.py:414-781 (UNetModel
    topology: ResBlocks, Down/Upsample, skip concats, zero-init out conv)
  cap4d/mmdm/net/mmdm_unet.py (MMDMUnetModel: zero-init 50→320 cond_linear
    added after input block 0; reference-slot substitution of latents/noise)
  cap4d/mmdm/net/attention.py (SpatioTemporalTransformer / BasicTransformerBlock
    / AttentionModule with spatial vs joint-"3d" modes; GEGLU feed-forward)

Shipped config (data/weights/mmdm/config_dump.yaml): model_channels 320,
channel_mult (1,2,4,4), num_res_blocks 2, attention at ds ∈ {1,2,4},
num_head_channels 64, temporal_mode "3d" applied at mult ≥ 2, context disabled.

Design notes (TPU):
  * NHWC everywhere; convs map straight onto XLA's fused conv ops.
  * The "3d" attention folds the V-view axis into one 32k-token sequence that
    runs on the Pallas flash kernel (ops/attention.py).
  * GroupNorm/LayerNorm/softmax always compute in fp32 (GroupNorm32 parity,
    diffusionmodules/util.py:217-223); everything else follows `dtype`
    (bfloat16 on TPU).
  * Flax submodule names mirror the torch state_dict paths (see convert.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from cap4d_tpu.ops.attention import attention_mode_reshape, dot_product_attention


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos | sin] order (ldm util.py:154-174)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _GNParams(nn.Module):
    """Scale/bias holder named to keep the torch-converter param paths."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 regardless of activation dtype.

    fuse_silu folds the following SiLU into the op; when `fused` is set the
    TPU Pallas kernel (ops/norms.py) handles eligible NHWC shapes."""

    num_groups: int = 32
    eps: float = 1e-5
    fuse_silu: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        c = x.shape[-1]
        scale, bias = _GNParams(features=c, name="gn")()
        if self.fused and x.ndim == 4:
            from cap4d_tpu.ops.norms import fused_group_norm_silu

            return fused_group_norm_silu(
                x, scale, bias, num_groups=self.num_groups, eps=self.eps,
                apply_silu=self.fuse_silu).astype(dt)
        xf = x.astype(jnp.float32)
        lead = xf.shape[:-1]
        xg = xf.reshape(*lead, self.num_groups, c // self.num_groups)
        red_axes = tuple(range(1, xf.ndim - 1)) + (xf.ndim,)
        mean = jnp.mean(xg, axis=red_axes, keepdims=True)
        var = jnp.var(xg, axis=red_axes, keepdims=True)
        out = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(xf.shape)
        out = out * scale + bias
        if self.fuse_silu:
            out = nn.silu(out)
        return out.astype(dt)


class LayerNorm32(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        out = nn.LayerNorm(
            epsilon=self.eps, dtype=jnp.float32, param_dtype=jnp.float32, name="ln"
        )(x.astype(jnp.float32))
        return out.astype(dt)


def _conv(features, kernel=3, stride=1, padding=1, name=None, dtype=None, zero_init=False):
    kinit = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        name=name, dtype=dtype, param_dtype=jnp.float32, kernel_init=kinit,
    )


def _dense(features, name=None, dtype=None, use_bias=True, zero_init=False):
    kinit = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Dense(features, name=name, dtype=dtype, param_dtype=jnp.float32,
                    use_bias=use_bias, kernel_init=kinit)


class ResBlock(nn.Module):
    """openaimodel.py:164-276 ResBlock (use_scale_shift_norm=False path)."""

    out_channels: int
    fused_norms: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = GroupNorm32(name="norm_in", fuse_silu=True, fused=self.fused_norms)(x)
        h = _conv(self.out_channels, name="conv_in", dtype=self.dtype)(h)
        emb_out = _dense(self.out_channels, name="emb_proj", dtype=self.dtype)(nn.silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(name="norm_out", fuse_silu=True, fused=self.fused_norms)(h)
        h = _conv(self.out_channels, name="conv_out", dtype=self.dtype, zero_init=True)(h)
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, kernel=1, padding=0, name="skip", dtype=self.dtype)(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _conv(self.out_channels, stride=2, name="op", dtype=self.dtype)(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return _conv(self.out_channels, name="conv", dtype=self.dtype)(x)


class AttentionModule(nn.Module):
    """attention.py:135-251 — q/k/v projections + mode-reshaped attention."""

    heads: int
    dim_head: int
    mode: str  # "spatial" | "3d" | "temporal"
    num_timesteps: int = 0
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (b·t, n, c)
        inner = self.heads * self.dim_head
        q = _dense(inner, name="to_q", use_bias=False, dtype=self.dtype)(x)
        k = _dense(inner, name="to_k", use_bias=False, dtype=self.dtype)(x)
        v = _dense(inner, name="to_v", use_bias=False, dtype=self.dtype)(x)
        qr, un = attention_mode_reshape(q, self.mode, self.num_timesteps, self.heads)
        kr, _ = attention_mode_reshape(k, self.mode, self.num_timesteps, self.heads)
        vr, _ = attention_mode_reshape(v, self.mode, self.num_timesteps, self.heads)
        out = un(dot_product_attention(qr, kr, vr, backend=self.backend))
        # to_out is zero-initialised except in "temporal" mode (attention.py:173-178)
        return _dense(x.shape[-1], name="to_out",
                      zero_init=self.mode != "temporal", dtype=self.dtype)(out)


class GEGLUFeedForward(nn.Module):
    """FeedForward with GEGLU gate, mult=4 (attention.py:68-95)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        proj = _dense(dim * 8, name="geglu_proj", dtype=self.dtype)(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate)
        return _dense(dim, name="proj_out", dtype=self.dtype)(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    temporal_connection_type: str  # "none" | "3d" | "temporal"
    num_timesteps: int
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mode = "3d" if self.temporal_connection_type == "3d" else "spatial"
        h = LayerNorm32(name="norm1")(x)
        x = AttentionModule(
            self.heads, self.dim_head, mode=mode, num_timesteps=self.num_timesteps,
            backend=self.backend, name="attn1", dtype=self.dtype,
        )(h) + x
        if self.temporal_connection_type == "temporal":
            h = LayerNorm32(name="norm_t")(x)
            x = AttentionModule(
                self.heads, self.dim_head, mode="temporal",
                num_timesteps=self.num_timesteps, backend=self.backend,
                name="attn_t", dtype=self.dtype,
            )(h) + x
        h = LayerNorm32(name="norm3")(x)
        x = GEGLUFeedForward(name="ff", dtype=self.dtype)(h) + x
        return x


class SpatioTemporalTransformer(nn.Module):
    """attention.py:329-388 — norm, linear proj in/out, 1 block, residual."""

    heads: int
    dim_head: int
    temporal_connection_type: str
    num_timesteps: int
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x):  # (bt, H, W, C)
        bt, H, W, C = x.shape
        x_in = x
        h = GroupNorm32(eps=1e-6, name="norm", fused=self.fused_norms)(x)
        h = h.reshape(bt, H * W, C)
        h = _dense(C, name="proj_in", dtype=self.dtype)(h)
        h = BasicTransformerBlock(
            self.heads, self.dim_head, self.temporal_connection_type,
            self.num_timesteps, backend=self.backend, name="block0", dtype=self.dtype,
        )(h)
        h = _dense(C, name="proj_out", zero_init=True, dtype=self.dtype)(h)
        return h.reshape(bt, H, W, C) + x_in


class MMDMUNet(nn.Module):
    """The full MMDM denoiser. Input/output latents are (B, T, H, W, C)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    num_head_channels: int = 64
    condition_channels: int = 50
    time_steps: int = 8              # V — views jointly denoised
    temporal_mode: str = "3d"        # "3d" | "temporal"
    attn_backend: str = "auto"
    fused_norms: bool = False        # TPU Pallas fused GroupNorm+SiLU
    remat: bool = False              # checkpoint each block (training memory)
    dtype: jnp.dtype = jnp.float32

    def _attn_block(self, ch: int, name: str):
        if self.temporal_mode == "temporal":
            conn = "temporal"
        else:  # "3d" only at mult ≥ 2 (mmdm_unet.py:49-55)
            conn = "3d" if ch >= 2 * self.model_channels else "none"
        cls = nn.remat(SpatioTemporalTransformer) if self.remat else SpatioTemporalTransformer
        return cls(
            heads=ch // self.num_head_channels,
            dim_head=self.num_head_channels,
            temporal_connection_type=conn,
            num_timesteps=self.time_steps,
            backend=self.attn_backend,
            name=name,
            dtype=self.dtype,
            fused_norms=self.fused_norms,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # (B, T, H, W, C) noisy latents
        timesteps: jnp.ndarray,  # (B, T) int32 — per-view timesteps
        cond: dict,              # {"pos_enc": (B,T,H,W,50), "z_input", "ref_mask"}
    ) -> jnp.ndarray:
        z_input = cond["z_input"]
        ref = cond["ref_mask"]  # (B, T, H, W, 1) — NHWC layout of the (b,t,1,h,w) ref mask
        x_input = x - z_input                     # ground-truth noise at ref slots
        x = z_input * ref + x * (1.0 - ref)       # substitute clean ref latents

        B, T, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C).astype(self.dtype)
        ts = timesteps.reshape(B * T)

        t_emb = timestep_embedding(ts, self.model_channels).astype(self.dtype)
        emb = _dense(self.model_channels * 4, name="time_embed_0", dtype=self.dtype)(t_emb)
        emb = _dense(self.model_channels * 4, name="time_embed_2", dtype=self.dtype)(nn.silu(emb))

        pos = cond["pos_enc"].reshape(B * T, H, W, -1).astype(self.dtype)
        pos_embedding = _dense(self.model_channels, name="cond_linear",
                               zero_init=True, dtype=self.dtype)(pos)

        mult = list(self.channel_mult)
        n_levels = len(mult)
        hs = []
        ds = 1
        ResBlockM = nn.remat(ResBlock) if self.remat else ResBlock

        # --- input blocks ---
        h = _conv(self.model_channels, name="input_blocks_0_0", dtype=self.dtype)(h)
        h = h + pos_embedding  # injected once, after block 0 (mmdm_unet.py:106-108)
        hs.append(h)
        block_idx = 1
        ch = self.model_channels
        input_chs = [ch]
        for level, m in enumerate(mult):
            for _ in range(self.num_res_blocks):
                ch = m * self.model_channels
                h = ResBlockM(ch, name=f"input_blocks_{block_idx}_0", dtype=self.dtype,
                             fused_norms=self.fused_norms)(h, emb)
                if ds in self.attention_resolutions:
                    h = self._attn_block(ch, f"input_blocks_{block_idx}_1")(h)
                hs.append(h)
                input_chs.append(ch)
                block_idx += 1
            if level != n_levels - 1:
                h = Downsample(ch, name=f"input_blocks_{block_idx}_0", dtype=self.dtype)(h)
                hs.append(h)
                input_chs.append(ch)
                block_idx += 1
                ds *= 2

        # --- middle ---
        h = ResBlockM(ch, name="middle_block_0", dtype=self.dtype,
                     fused_norms=self.fused_norms)(h, emb)
        h = self._attn_block(ch, "middle_block_1")(h)
        h = ResBlockM(ch, name="middle_block_2", dtype=self.dtype,
                     fused_norms=self.fused_norms)(h, emb)

        # --- output blocks ---
        block_idx = 0
        for level in reversed(range(n_levels)):
            m = mult[level]
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = m * self.model_channels
                h = ResBlockM(ch, name=f"output_blocks_{block_idx}_0", dtype=self.dtype,
                             fused_norms=self.fused_norms)(h, emb)
                sub = 1
                if ds in self.attention_resolutions:
                    h = self._attn_block(ch, f"output_blocks_{block_idx}_{sub}")(h)
                    sub += 1
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, name=f"output_blocks_{block_idx}_{sub}", dtype=self.dtype)(h)
                    ds //= 2
                block_idx += 1

        h = GroupNorm32(name="out_norm", fuse_silu=True, fused=self.fused_norms)(h)
        h = _conv(self.out_channels, name="out_conv", zero_init=True, dtype=self.dtype)(h)

        h = h.astype(x.dtype).reshape(B, T, H, W, self.out_channels)
        # noise at ref slots is replaced by the true noise (mmdm_unet.py:125)
        return x_input * ref + h * (1.0 - ref)
