"""MMDM model assembly: UNet + VAE + conditioning + schedule from a
reference-format config_dump.yaml.

Reference parity: cap4d/mmdm/mmdm.py (MMLDM) and cap4d/inference/utils.py:44-61
(load_model). Keeps the reference's YAML schema and checkpoint layout
(data/weights/mmdm/checkpoints/*.ckpt newest-by-ctime + config_dump.yaml) so a
reference weights download drops in unchanged.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from cap4d_tpu.mmdm.conditioning import (
    CAP4DConditioning,
    conditioning_forward,
    load_prop_renderer_assets,
)
from cap4d_tpu.mmdm.schedule import DiffusionSchedule, make_mmdm_schedule
from cap4d_tpu.mmdm.unet import MMDMUNet
from cap4d_tpu.mmdm.vae import SCALE_FACTOR, AutoencoderKL

DEFAULT_FLAME_ASSETS = Path("data/assets/flame")


def _coerce_numbers(obj):
    """YAML 1.1 parses '5e-3' / '1_0000' as strings (OmegaConf coerced them in
    the reference); convert numeric-looking strings recursively."""
    if isinstance(obj, dict):
        return {k: _coerce_numbers(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_coerce_numbers(v) for v in obj]
    if isinstance(obj, str):
        try:
            return int(obj)
        except ValueError:
            try:
                return float(obj)
            except ValueError:
                return obj
    return obj


def load_yaml(path: str | Path) -> Dict[str, Any]:
    with open(path) as fh:
        return _coerce_numbers(yaml.safe_load(fh))


@functools.lru_cache(maxsize=8)
def _jitted_vae(vae, method: str):
    """Jitted VAE encode/decode, cached per module config. Unjitted
    ``vae.apply`` dispatches every conv eagerly — harmless on CPU, but each
    dispatch through the tunneled-TPU relay costs ~100 ms, which made the
    84-image @512 decode phase ~2 minutes. Params are ARGUMENTS (closed-over
    params would embed gigabytes of constants in the HLO)."""
    if method == "encode":
        def f(params, x, rng):
            return vae.apply({"params": params}, x, rng, method=vae.encode)
    else:
        def f(params, x):
            return vae.apply({"params": params}, x, method=vae.decode)
    return jax.jit(f)


@jax.jit
def _u8_post(x):
    """[-1,1] float image → uint8 [0,255] on device (same truncating
    conversion as the host save path: clip → ×255 → floor-cast)."""
    return (jnp.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@dataclass
class MMDM:
    """The morphable multi-view diffusion model (inference-ready bundle)."""

    unet: MMDMUNet
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    cond_model: CAP4DConditioning
    schedule: DiffusionSchedule
    n_frames: int = 8
    scale_factor: float = SCALE_FACTOR
    latent_size: int = 64
    cfg_probability: float = 0.1

    # ---------------- construction ----------------

    @classmethod
    def from_config(
        cls,
        config: Dict[str, Any] | str | Path,
        ckpt_path: Optional[str | Path] = None,
        flame_asset_dir: str | Path = DEFAULT_FLAME_ASSETS,
        dtype=jnp.float32,
        rng: Optional[jax.Array] = None,
        attn_backend: str = "auto",
        fused_norms: bool = True,
        remat: bool = False,
    ) -> "MMDM":
        """Build from a reference config_dump.yaml dict/path.

        ckpt_path: directory containing checkpoints/*.ckpt (newest by ctime is
        loaded, cap4d/inference/utils.py:44-47); None → random init.
        """
        if not isinstance(config, dict):
            config = load_yaml(config)
        mp = config["model"]["params"]
        up = mp["unet_config"]["params"]
        cp = mp["cond_stage_config"]["params"]
        dd = mp["first_stage_config"]["params"]["ddconfig"]

        unet = MMDMUNet(
            in_channels=up["in_channels"],
            out_channels=up["out_channels"],
            model_channels=up["model_channels"],
            channel_mult=tuple(up["channel_mult"]),
            num_res_blocks=up["num_res_blocks"],
            attention_resolutions=tuple(up["attention_resolutions"]),
            num_head_channels=up["num_head_channels"],
            condition_channels=up["condition_channels"],
            time_steps=up["time_steps"],
            temporal_mode=up.get("temporal_mode", "3d"),
            attn_backend=attn_backend,
            fused_norms=fused_norms,
            remat=remat,
            dtype=dtype,
        )
        vae = AutoencoderKL(
            embed_dim=mp["first_stage_config"]["params"]["embed_dim"],
            ch=dd["ch"],
            ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            z_channels=dd["z_channels"],
            out_ch=dd["out_ch"],
            dtype=dtype,
        )
        assets = load_prop_renderer_assets(
            Path(flame_asset_dir) / "cap4d_flame_template.obj",
            Path(flame_asset_dir) / "head_vertices.txt",
        )
        cond_model = CAP4DConditioning(
            assets=assets,
            image_size=cp["image_size"],
            positional_channels=cp["positional_channels"],
            positional_multiplier=cp.get("positional_multiplier", 1.0),
            super_resolution=cp.get("super_resolution", 2),
            use_ray_directions=cp.get("use_ray_directions", True),
            use_expr_deformation=cp.get("use_expr_deformation", True),
            use_crop_mask=cp.get("use_crop_mask", False),
        )
        schedule = make_mmdm_schedule(
            timesteps=mp["timesteps"],
            linear_start=mp["linear_start"],
            linear_end=mp["linear_end"],
            zero_snr_shift=mp.get("zero_snr_shift", True),
            shift=mp.get("shift_schedule", False),
            sqrt_shift=mp.get("sqrt_shift", False),
            minus_one_shift=mp.get("minus_one_shift", True),
            negative_shift=mp.get("negative_shift", False),
            n_frames=mp["n_frames"],
            image_size=mp["image_size"],
        )

        lat = mp["image_size"]
        V = mp["n_frames"]
        dummy_cond = {
            "pos_enc": jnp.zeros((1, V, lat, lat, up["condition_channels"])),
            "z_input": jnp.zeros((1, V, lat, lat, up["in_channels"])),
            "ref_mask": jnp.zeros((1, V, lat, lat, 1)),
        }
        # shape-only init: materialising ~800M params via device init is very
        # slow on tunneled TPUs, and when a checkpoint is given only the tree
        # STRUCTURE is needed
        unet_shapes = jax.eval_shape(
            lambda: unet.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, V, lat, lat, up["in_channels"])),
                              jnp.zeros((1, V), jnp.int32), dummy_cond))["params"]
        vae_shapes = jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 8 * lat, 8 * lat, dd["in_channels"]))))["params"]
        host_rng = np.random.default_rng(0)

        def host_init(shapes):
            def mk(s):
                # zero-init biases/norm-offsets, small-normal everything else
                if len(s.shape) <= 1:
                    base = np.zeros(s.shape, np.float32)
                else:
                    base = host_rng.normal(scale=0.02, size=s.shape).astype(np.float32)
                return base.astype(s.dtype) if s.dtype != jnp.float32 else base
            # ONE batched device_put for the whole tree: per-leaf jnp.asarray
            # paid a tunnel round-trip per parameter (~5 min for the ~1000
            # UNet leaves on the relayed TPU; measured round 3)
            return jax.device_put(jax.tree.map(mk, shapes))

        if ckpt_path is None:
            # random-weights mode (tests/benches): materialise the params ON
            # DEVICE with one jitted program — pushing ~3.4 GB of host-drawn
            # fp32 through the TPU tunnel took minutes; a compiled
            # RNG-normal per leaf takes none (same init distribution, not
            # the same bits as host_init — nothing depends on which)
            def dev_init(shapes, seed):
                def mk(path_rng, s):
                    if len(s.shape) <= 1:
                        return jnp.zeros(s.shape, s.dtype)
                    return (0.02 * jax.random.normal(path_rng, s.shape)
                            ).astype(s.dtype)
                leaves, treedef = jax.tree.flatten(shapes)
                keys = list(jax.random.split(jax.random.PRNGKey(seed),
                                             len(leaves)))
                return jax.tree.unflatten(
                    treedef, [mk(k, s) for k, s in zip(keys, leaves)])

            unet_params = jax.jit(partial(dev_init, unet_shapes))(0)
            vae_params = jax.jit(partial(dev_init, vae_shapes))(1)
        else:
            unet_params = host_init(unet_shapes)
            vae_params = host_init(vae_shapes)

        if ckpt_path is not None:
            from cap4d_tpu.mmdm.convert import load_mmdm_checkpoint

            ckpts = list((Path(ckpt_path) / "checkpoints").glob("*.ckpt"))
            latest = max(ckpts, key=os.path.getctime)
            print(f"Loading MMDM weights from {latest}")
            unet_params, vae_params = load_mmdm_checkpoint(latest, unet_params, vae_params)
            unet_params = jax.tree.map(jnp.asarray, unet_params)
            vae_params = jax.tree.map(jnp.asarray, vae_params)

        return cls(
            unet=unet,
            unet_params=unet_params,
            vae=vae,
            vae_params=vae_params,
            cond_model=cond_model,
            schedule=schedule,
            n_frames=mp["n_frames"],
            scale_factor=mp.get("scale_factor", SCALE_FACTOR),
            latent_size=mp["image_size"],
            cfg_probability=mp.get("cfg_probability", 0.1),
        )

    # ---------------- first stage ----------------

    def encode_images(self, images: np.ndarray, rng: jax.Array, chunk: int = 8) -> jnp.ndarray:
        """(N, H, W, 3) in [-1,1] → scaled latents (N, h, w, 4).

        Posterior-sampled like the reference's get_first_stage_encoding
        (ddpm.py:656, scale 0.18215)."""
        enc = _jitted_vae(self.vae, "encode")
        outs = []
        for i in range(0, images.shape[0], chunk):
            rng, sub = jax.random.split(rng)
            x = jnp.asarray(images[i : i + chunk])
            n = x.shape[0]
            if n < chunk:  # pad the tail: one compiled shape for all chunks
                x = jnp.concatenate(
                    [x, jnp.zeros((chunk - n, *x.shape[1:]), x.dtype)])
            outs.append(enc(self.vae_params, x, sub)[:n])
        return jnp.concatenate(outs, axis=0) * self.scale_factor

    def decode_latents(self, z: jnp.ndarray, chunk: int = 8,
                       as_uint8: bool = False) -> np.ndarray:
        """Scaled latents (N, h, w, 4) → images (N, H, W, 3) in [-1,1]
        (or uint8 [0,255] with ``as_uint8``).

        All chunks are DISPATCHED before any is fetched: the device decodes
        the whole batch back-to-back while the host streams the earlier
        results out (a fetch-per-chunk loop serialised decode and transfer —
        the 84-frame multi-ref decode phase measured 17-104 s of mostly
        transfer wait). ``as_uint8`` converts on device, cutting the
        fetched bytes 4× for image-saving callers."""
        dec = _jitted_vae(self.vae, "decode")
        post = _u8_post if as_uint8 else None
        pend = []
        for i in range(0, z.shape[0], chunk):
            x = jnp.asarray(z[i : i + chunk]) / self.scale_factor
            n = x.shape[0]
            if n < chunk:
                x = jnp.concatenate(
                    [x, jnp.zeros((chunk - n, *x.shape[1:]), x.dtype)])
            out = dec(self.vae_params, x)
            pend.append((post(out) if post else out, n))
        return np.concatenate(
            [np.asarray(o)[:n] for o, n in pend], axis=0)

    # ---------------- conditioning ----------------

    def prepare_conditioning(
        self, cond_batch: Dict[str, np.ndarray], z: Optional[jnp.ndarray] = None,
        chunk: int = 32,
    ) -> Dict[str, np.ndarray]:
        """Per-frame conditional conditioning bank, time axis folded away.

        cond_batch arrays are (N, 1, ...) as produced by build_frame_set.
        Returns {"pos_enc": (N,H,W,50), "z_input": (N,h,w,4), "ref_mask": (N,h,w,1)}.
        (The unconditional bank is all-zeros by construction — cap4dcond.py:78-88 —
        so it is synthesised in the sampler rather than stored.)
        """
        n = cond_batch["verts_2d"].shape[0]
        outs = []
        for i in range(0, n, chunk):
            piece = {k: jnp.asarray(v[i : i + chunk]) for k, v in cond_batch.items()}
            if z is not None:
                piece["z"] = z[i : i + chunk, None]
            # keep the bank ON DEVICE: fetching it (N·128²·50·4B ≈ 262 MB at
            # 80 frames) to host and re-uploading it for the sampler cost
            # minutes through the tunneled TPU; callers that need host
            # copies (condition vis, npz dumps) np.asarray on demand
            outs.append(conditioning_forward(self.cond_model, piece,
                                             unconditional=False))
        merged = {}
        for key in outs[0]:
            if outs[0][key] is None:
                merged[key] = None
                continue
            cat = jnp.concatenate([o[key] for o in outs], axis=0)
            merged[key] = cat[:, 0]  # fold T=1
        if merged.get("z_input") is None:
            merged["z_input"] = jnp.zeros(
                (n, self.latent_size, self.latent_size, self.unet.in_channels), jnp.float32
            )
        if merged["ref_mask"].shape[-1] != 1:  # (N, 1, h, w) → (N, h, w, 1)
            merged["ref_mask"] = jnp.moveaxis(merged["ref_mask"], 1, -1)
        return merged

    # ---------------- denoiser ----------------

    def apply_model(self, x: jnp.ndarray, t: jnp.ndarray, cond: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """eps prediction, (B, T, h, w, 4) in/out (mmdm.py:113-124)."""
        return self.unet.apply({"params": self.unet_params}, x, t, cond)
