"""CAP4D conditioning encoder: FLAME-rendered 50-channel condition maps.

Reference parity: cap4d/mmdm/conditioning/cap4dcond.py (CAP4DConditioning,
PositionalEncoding) + cap4d/mmdm/conditioning/mesh2img.py (PropRenderer).

Channel layout (config condition_channels=50, config_dump.yaml:104):
  42  sinusoidal-encoded canonical-position map (14 per xyz dim)
   3  expression-offset map (normalised by std 0.0104)
   3  camera ray map (rotated into the reference camera frame)
   1  reference mask
   1  out-of-crop mask

TPU-first: the whole encoder is one jitted function over (B·T) frames; the
rasterization runs at 2× super-resolution and is area-pooled to the latent
grid, exactly as the reference. It runs ONCE per frame before sampling, not
per diffusion step.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cap4d_tpu.ops.rasterize import (
    interpolate_face_attributes,
    load_obj,
    rasterize_meshes,
)


def positional_encoding(x: jnp.ndarray, channels_per_dim: int) -> jnp.ndarray:
    """(..., D) → (..., D·channels_per_dim) sinusoidal features.

    freqs = 2^[0..n-1]; output per input dim is [sin(x·f0..fn), cos(x·f0..fn)]
    (cap4dcond.py:9-35, including the (c f) channel interleaving order)."""
    n_ch = channels_per_dim // 2
    freqs = 2.0 ** jnp.arange(n_ch, dtype=x.dtype)
    ang = x[..., None] * freqs  # (..., D, n_ch)
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (..., D, 2n)
    return emb.reshape(*x.shape[:-1], x.shape[-1] * channels_per_dim)


def area_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H, W, C) average-pool by integer factor (= F.interpolate mode='area')."""
    if factor == 1:
        return x
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // factor, factor, W // factor, factor, C)
    return x.mean(axis=(-4, -2))


@struct.dataclass
class PropRendererAssets:
    """Template mesh + masks backing the conditioning rasterizer
    (mesh2img.py:298-337)."""

    faces: jnp.ndarray       # (F, 3) int32
    props: jnp.ndarray       # (V, 3) normalised canonical positions
    face_mask: jnp.ndarray   # (F,) bool — head + mouth faces only


def load_prop_renderer_assets(
    template_path: str | Path,
    head_vert_path: str | Path,
    n_mouth_verts: int = 200,
) -> PropRendererAssets:
    verts, faces, _uvs, _fuv = load_obj(template_path)
    vert_mask = np.zeros(verts.shape[0], bool)
    head_verts = np.genfromtxt(head_vert_path).astype(np.int64)
    vert_mask[head_verts] = True
    vert_mask[-n_mouth_verts:] = True
    face_mask = vert_mask[faces].max(axis=-1)
    props = verts - verts.mean(axis=-2, keepdims=True)
    props = props / props.max()
    return PropRendererAssets(
        faces=jnp.asarray(faces),
        props=jnp.asarray(props, jnp.float32),
        face_mask=jnp.asarray(face_mask),
    )


@partial(jax.jit, static_argnames=("image_size",))
def render_prop_maps(
    assets: PropRendererAssets,
    verts_ndc: jnp.ndarray,          # (N, V, 3) pytorch3d NDC + depth
    extra_prop: jnp.ndarray,         # (N, V, D) per-vertex property (offsets)
    image_size: int,
) -> Dict[str, jnp.ndarray]:
    """Rasterize canonical positions + a per-vertex property map.

    Returns {"pose_map": (N,H,W,3), "prop_map": (N,H,W,D), "mask": (N,H,W,1)}.
    """
    n = verts_ndc.shape[0]
    frag = rasterize_meshes(verts_ndc, assets.faces, (image_size, image_size))
    base_props = assets.props[assets.faces]  # (F, 3, 3)
    attrs = jnp.concatenate(
        [
            jnp.broadcast_to(base_props[None], (n, *base_props.shape)),
            extra_prop[:, assets.faces],  # (N, F, 3, D)
        ],
        axis=-1,
    )
    maps = interpolate_face_attributes(frag.pix_to_face, frag.bary_coords, attrs)
    covered = frag.pix_to_face >= 0
    head_face = assets.face_mask[jnp.clip(frag.pix_to_face, 0)]
    mask = (covered & head_face)[..., None]
    return {
        "pose_map": maps[..., :3],
        "prop_map": maps[..., 3:],
        "mask": mask,
    }


@struct.dataclass
class CAP4DConditioning:
    """Conditioning encoder (the cond_stage_model). No trainable parameters."""

    assets: PropRendererAssets
    image_size: int = struct.field(pytree_node=False, default=64)
    positional_channels: int = struct.field(pytree_node=False, default=42)
    positional_multiplier: float = struct.field(pytree_node=False, default=1.0)
    super_resolution: int = struct.field(pytree_node=False, default=2)
    use_ray_directions: bool = struct.field(pytree_node=False, default=True)
    use_expr_deformation: bool = struct.field(pytree_node=False, default=True)
    use_crop_mask: bool = struct.field(pytree_node=False, default=True)
    std_expr_deformation: float = struct.field(pytree_node=False, default=0.0104)

    @property
    def total_channels(self) -> int:
        c = self.positional_channels + 1  # + ref mask
        if self.use_crop_mask:
            c += 1
        if self.use_ray_directions:
            c += 3
        if self.use_expr_deformation:
            c += 3
        return c

    def __call__(self, batch: Dict[str, jnp.ndarray], unconditional: bool = True):
        return conditioning_forward(self, batch, unconditional)

    def get_vis(self, enc: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Debug visualisations of the encoded maps (cap4dcond.py:141-171)."""
        vis = {}
        n_pos = self.positional_channels // 3
        for i in range(n_pos - 2, n_pos):
            vis[f"pose_map_{i}"] = enc[..., [i, i + n_pos, i + n_pos * 2]]
        c = self.positional_channels
        if self.use_expr_deformation:
            vis["expr_disp"] = enc[..., c : c + 3]
            c += 3
        if self.use_ray_directions:
            vis["ray_map"] = enc[..., c : c + 3]
            c += 3
        vis["ref_mask"] = enc[..., [c] * 3]
        c += 1
        if self.use_crop_mask:
            vis["crop_mask"] = enc[..., [c] * 3]
        return vis


@partial(jax.jit, static_argnames=("unconditional",))
def conditioning_forward(
    cond: CAP4DConditioning,
    batch: Dict[str, jnp.ndarray],
    unconditional: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Build {"pos_enc": (B,T,H,W,C), "z_input", "ref_mask"} from a frame batch.

    batch keys (cap4d/inference/data/inference_data.py:108-114 contract):
      verts_2d (B,T,V,3) NDC, offsets_3d (B,T,V,3), ray_map (B,T,3,h,w),
      reference_mask (B,T,h,w), out_crop_mask (B,T,h,w), optional z (B,T,4,h,w).
    """
    verts = batch["verts_2d"]
    B, T = verts.shape[:2]
    img_size = cond.image_size
    ref_mask = batch["reference_mask"][:, :, None]  # (B,T,1,h,w)
    z_input = batch.get("z")

    if unconditional:
        pos_enc = jnp.zeros((B, T, img_size, img_size, cond.total_channels), jnp.float32)
        if z_input is not None:
            z_input = z_input * 0.0
        return {"pos_enc": pos_enc, "z_input": z_input, "ref_mask": ref_mask}

    offsets = batch["offsets_3d"] / cond.std_expr_deformation
    verts_f = verts.reshape(B * T, *verts.shape[2:])
    offsets_f = offsets.reshape(B * T, *offsets.shape[2:])

    sr_size = img_size * cond.super_resolution
    maps = render_prop_maps(
        cond.assets,
        verts_f,
        offsets_f if cond.use_expr_deformation else jnp.zeros_like(offsets_f[..., :0]),
        sr_size,
    )

    enc = positional_encoding(
        maps["pose_map"] * cond.positional_multiplier, cond.positional_channels // 3
    )
    if cond.use_expr_deformation:
        enc = jnp.concatenate([enc, maps["prop_map"]], axis=-1)
    enc = enc * maps["mask"]
    enc = area_downsample(enc, cond.super_resolution)
    enc = enc.reshape(B, T, img_size, img_size, -1)

    if cond.use_ray_directions:
        ray_map = jnp.transpose(batch["ray_map"], (0, 1, 3, 4, 2))  # (B,T,h,w,3)
        enc = jnp.concatenate([enc, ray_map], axis=-1)

    enc = jnp.concatenate([enc, jnp.transpose(ref_mask, (0, 1, 3, 4, 2))], axis=-1)
    if cond.use_crop_mask:
        enc = jnp.concatenate([enc, batch["out_crop_mask"][..., None]], axis=-1)

    return {"pos_enc": enc, "z_input": z_input, "ref_mask": ref_mask}
