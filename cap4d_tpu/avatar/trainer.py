"""Avatar fitting trainer: jitted train step + adaptive density control loop.

Reference parity: gaussianavatars/train.py:43-248 (training loop, losses,
densification cadence, checkpointing) and cap4d_gaussian_model.py:381-441
(optimizer groups + exponential lr schedules; torch Adam eps 1e-15, SparseAdam
for the per-frame neck embedding).

TPU-first: the whole iteration — FLAME forward ×2, UV resample, deform U-Net,
face frames, 3DGS render, all losses, gradients and the per-group Adam
updates — is ONE jitted function; the host only picks the next camera and the
scheduled learning rates. Densify/prune/opacity-reset are separate jitted
pure functions on the static-capacity gaussian store called on the reference's
cadence.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cap4d_tpu.avatar import gaussians as G
from cap4d_tpu.avatar.binding import safe_norm
from cap4d_tpu.avatar.binding import relative_rotation_loss_pack
from cap4d_tpu.avatar.flame_avatar import (
    FlameAvatarConfig,
    FlameVariant,
    UVAssets,
    allocate_gaussians,
    build_uv_assets,
    laplacian_loss,
    load_avatar_template,
    make_deform_net,
    mesh_properties,
    relative_deformation_loss_ch,
    relative_neck_rotation,
)
from cap4d_tpu.avatar.losses import l1_loss, ssim
from cap4d_tpu.avatar.lpips import LPIPS
from cap4d_tpu.avatar.scene import SceneInfo
from cap4d_tpu.flame.compute import load_cap4d_flame_model
from cap4d_tpu.flame.skinner import FlameModel
from cap4d_tpu.ops.gsplat import rasterize_gaussians
from cap4d_tpu.ops.gsplat_pallas import rasterize_gaussians_pallas


def resolve_raster_backend(backend: str = "auto") -> str:
    """'pallas' (TPU tile kernel, exact compositing) or 'xla' (portable
    sort+cumsum fallback). 'auto' picks pallas on TPU."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def make_raster(backend: str, width: int, height: int, sh_degree: int,
                max_per_tile: int, max_tiles_per_gaussian: int,
                render_depth: bool = False, far: Optional[float] = None,
                max_valid_pairs: Optional[int] = None,
                mid_budget: Optional[int] = None,
                big_budget: Optional[int] = None,
                small_budget: Optional[int] = None,
                base_side: int = 2,
                big_tiles_per_gaussian: int = 49):
    """Partial rasterizer for one static signature.

    The pallas path has no per-tile compositing cap (max_per_tile is ignored:
    compositing is exact at any overlap depth); only the side² tile-footprint
    cap max_tiles_per_gaussian applies to both. max_valid_pairs bounds the
    pallas path's materialized sorted-pair prefix (overflow counted in
    n_truncated_depth); small/mid/big_budget size the pallas
    footprint-expansion levels (None/0 = capacity-fraction autos)."""
    kw = dict(width=width, height=height, sh_degree=sh_degree,
              max_tiles_per_gaussian=max_tiles_per_gaussian,
              render_depth=render_depth)
    if far is not None:
        kw["far"] = far
    if resolve_raster_backend(backend) == "pallas":
        if mid_budget is not None:
            kw["mid_budget"] = mid_budget
        if big_budget is not None:
            kw["big_budget"] = big_budget
        if small_budget is not None:
            kw["small_budget"] = small_budget
        return partial(rasterize_gaussians_pallas, base_side=base_side,
                       max_valid_pairs=max_valid_pairs,
                       big_tiles_per_gaussian=big_tiles_per_gaussian, **kw)
    return partial(rasterize_gaussians, max_per_tile=max_per_tile,
                   tile_chunk=64, **kw)


def _quantize_capacity(n_active: int, factor: float, quantum: int = 16384) -> int:
    """Initial padded-store capacity: every n-sized sort/gather in the step
    pays for PADDING slots too, so the store starts tight (factor 1.1) and
    relies on the async grown-capacity compile path (train.py n_dropped →
    schedule_capacity) when densification outruns the headroom. Quantized
    up so fits over similar scenes share persistent-cache executables; tiny
    (sub-quantum) test scenes keep an exact small store instead of paying a
    16k-slot floor."""
    cap = max(int(n_active * factor), n_active + 64)
    if cap >= quantum:
        cap = -(-cap // quantum) * quantum
    return cap


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear lr interpolation (utils/general_utils.py:29-61)."""
    if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
        return 0.0
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = np.clip(step / max_steps, 0, 1)
    return delay * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)


def expon_lr_traced(step, lr_init, lr_final, lr_delay_steps=0,
                    lr_delay_mult=1.0, max_steps=1_000_000):
    """:func:`expon_lr` with a traced ``step`` — the schedule runs INSIDE the
    jitted train step so the loop ships one iteration scalar per step instead
    of re-uploading three freshly-built lr scalars through the TPU tunnel
    every iteration. All schedule constants stay static Python floats."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.float32(0.0)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    return delay * jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)


def adam_update(p, g, m, v, step, lr, eps=1e-15, b1=0.9, b2=0.999, wd=0.0):
    """torch.optim.Adam semantics (L2 via grad, bias correction)."""
    g = g + wd * p
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    mhat = m / (1 - b1**step)
    vhat = v / (1 - b2**step)
    return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v


@dataclass
class AvatarTrainer:
    variant: Any                         # FlameVariant | SMPLVariant
    uv: UVAssets
    config: FlameAvatarConfig
    opt: Dict[str, Any]                  # opt_params from the YAML
    gauss_params: G.GaussianParams
    gauss_aux: G.GaussianAux
    deform_params: Any
    neck_weight: jnp.ndarray             # (T, 3)
    flame_bank: Dict[str, jnp.ndarray]   # shape, base_rot, expr/eye_rot/rot/tra (T, ·)
    moments: Dict[str, Any]              # adam m/v per group
    lpips: LPIPS
    active_sh_degree: int = 0
    iteration: int = 0
    _render_fns: Dict = None
    _render_compiled: Dict = None   # AOT prewarm executables (same keys)
    # rasterizer knobs — raising either is a recompile boundary, done by the
    # train loop when the step reports truncation (like n_dropped→grow_capacity)
    raster_backend: str = "auto"
    max_per_tile: int = 192
    max_tiles_per_gaussian: int = 9
    # side² of the budgeted BIG footprint level (pallas path); grown past the
    # mid-window ceiling when truncation persists — only the ~n/128
    # largest-span splats pay its slots, so an 11×11 or 13×13 window for the
    # few giant off-template splats costs ~15% more pair slots, not 2-4×.
    big_tiles_per_gaussian: int = 49
    # pallas valid-prefix pair cap; 0 = auto (3x gaussian capacity). Doubled
    # by grow_raster_caps(depth=True) when n_truncated_depth fires.
    max_valid_pairs: int = 0
    # pallas footprint-expansion budgets; 0 = active-count autos
    # (_active_ext_budgets). grow_raster_caps(footprint=True) doubles them
    # (capped at capacity) alongside the window side: footprint truncation
    # can mean either a too-small window or a too-small ext budget, and
    # growing both converges without per-cause counters.
    small_budget: int = 0
    mid_budget: int = 0
    big_budget: int = 0
    spatial_lr_scale: float = 1.0   # reference cameras_extent (scene.py:125)

    def _auto_valid_pairs(self, capacity: Optional[int] = None) -> int:
        cap = self.max_valid_pairs
        if not cap:
            gp = getattr(self, "gauss_params", None)
            if gp is None:
                return 0
            # size by the ACTIVE count, not capacity: the fwd pair gather and
            # the kernel pair array are m_cap-sized whether or not the slots
            # hold valid pairs, and inactive capacity padding emits none.
            # Rounded up to 64k so step rebuilds after ordinary densification
            # reuse the compiled shape; undersizing is self-healing (the
            # n_truncated_depth counter doubles the cap and recompiles, both
            # in the train loop and in bench.build_fit_step's probe).
            # `capacity` overrides the store size when building a step for a
            # grown store that hasn't been padded yet (step_compiler).
            aux = getattr(self, "gauss_aux", None)
            C = capacity or int(gp.xyz.shape[0])
            n = int(aux.n_active) if aux is not None else C
            cap = min(-(-3 * n // 65536) * 65536, 3 * C)
        return cap

    def _active_ext_budgets(self, capacity: Optional[int] = None) -> Dict[str, int]:
        """Footprint ext-level budgets sized by the ACTIVE splat count.

        The pallas ext regions address span-COMPACTED prefixes, and inactive
        capacity padding has span_eff=1 so it sorts to the compaction tail —
        capacity-fraction autos (gsplat_pallas._auto) therefore oversize every
        ext level by capacity/active (the init headroom). Every ext SLOT costs sort
        keys and ~12 ns/column in the VJP's m-sized unsort gather whether or
        not it holds a live pair, so budgets here use the same span-census
        fractions applied to n_active, quantized to 8192 so ordinary
        densification growth rebuilds hit the same compiled shape.
        Undersizing self-heals exactly like the valid-pairs cap: n_truncated
        fires and grow_raster_caps doubles the budgets."""
        explicit = {"small_budget": self.small_budget,
                    "mid_budget": self.mid_budget,
                    "big_budget": self.big_budget}
        gp = getattr(self, "gauss_params", None)
        aux = getattr(self, "gauss_aux", None)
        if gp is None:
            return {k: v or None for k, v in explicit.items()}
        C = capacity or int(gp.xyz.shape[0])
        n = int(aux.n_active) if aux is not None else C
        nq = min(-(-n // 8192) * 8192, C)

        def q(frac, quantum):
            return min(max(quantum, -(-int(nq * frac) // quantum) * quantum), C)

        autos = {"small_budget": q(5 / 8, 512),
                 "mid_budget": q(1 / 32, 512),
                 "big_budget": q(1 / 128, 256)}
        return {k: explicit[k] or autos[k] for k in autos}

    # growth ceilings: the MID window (every over-2×2 splat within
    # mid_budget pays its slots) stops at 7×7; the budgeted BIG level keeps
    # going to 13×13 — persistent giant-splat truncation (e.g. the handful
    # of off-template shoulder splats in a head fit) biases their gradients
    # every step and measurably degrades the region they cover.
    MID_TILES_CEILING = 49
    BIG_TILES_CEILING = 169

    @property
    def raster_caps_at_ceiling(self) -> bool:
        if resolve_raster_backend(self.raster_backend) != "pallas":
            # the XLA fallback only consumes max_tiles_per_gaussian; growing
            # the big window / ext budgets there is a no-op that would cost
            # up to 3 flush+recompile cycles with unchanged output
            return self.max_tiles_per_gaussian >= self.MID_TILES_CEILING
        return (self.max_tiles_per_gaussian >= self.MID_TILES_CEILING
                and self.big_tiles_per_gaussian >= self.BIG_TILES_CEILING)

    def grow_raster_caps(self, footprint: bool, depth: bool) -> None:
        """Raise the truncating cap(s); caller must rebuild step fns."""
        if footprint:
            if self.max_tiles_per_gaussian < self.MID_TILES_CEILING:
                side = int(self.max_tiles_per_gaussian ** 0.5) + 2
                self.max_tiles_per_gaussian = side * side
            elif self.big_tiles_per_gaussian < self.BIG_TILES_CEILING:
                big_side = int(self.big_tiles_per_gaussian ** 0.5) + 2
                self.big_tiles_per_gaussian = big_side * big_side
            self.big_tiles_per_gaussian = max(self.big_tiles_per_gaussian,
                                              self.max_tiles_per_gaussian)
            gp = getattr(self, "gauss_params", None)
            n = int(gp.xyz.shape[0]) if gp is not None else 0
            autos = self._active_ext_budgets() if gp is not None else {}
            for name in ("small_budget", "mid_budget", "big_budget"):
                cur = getattr(self, name, 0) or autos.get(name) or 0
                if cur:
                    setattr(self, name, min(2 * cur, n) if n else 2 * cur)
        if depth:
            self.max_per_tile = self.max_per_tile * 2
            auto = self._auto_valid_pairs()
            if auto:
                self.max_valid_pairs = auto * 2
        if self._render_fns:
            self._render_fns.clear()
        if self._render_compiled:
            self._render_compiled.clear()

    # ------------------------------------------------------------------ build

    @classmethod
    def create(
        cls,
        scene: SceneInfo,
        model_params: Dict[str, Any],
        opt_params: Dict[str, Any],
        flame_asset_dir: str | Path = "data/assets/flame",
        capacity_factor: float = 1.1,
        lpips: Optional[LPIPS] = None,
        seed: int = 0,
    ) -> "AvatarTrainer":
        config = FlameAvatarConfig(
            uv_resolution=model_params["uv_resolution"],
            n_unet_layers=model_params["n_unet_layers"],
            use_expr_mask=model_params["use_expr_mask"],
            static_neck=model_params["static_neck"],
            use_lower_jaw=model_params["use_lower_jaw"],
            n_gaussians_init=model_params["n_gaussians_init"],
            n_points_per_triangle=model_params["n_points_per_triangle"],
            sh_degree=model_params["sh_degree"],
            gaussian_init_type=model_params.get("gaussian_init_type", "scaled"),
        )
        flame_model = load_cap4d_flame_model(
            flame_asset_dir, n_shape_params=150, n_expr_params=65,
            add_mouth=True, add_lower_jaw=config.use_lower_jaw,
        )
        tv, tf, tuv, tfuv, deformable = load_avatar_template(flame_asset_dir)
        uv = build_uv_assets(tv, tf, tuv, tfuv, deformable, config.uv_resolution)
        variant = FlameVariant(flame_model, uv, config)

        binding, counts = allocate_gaussians(
            uv, jnp.asarray(tv), config.n_gaussians_init, config.n_points_per_triangle)
        n_faces = uv.remesh_faces.shape[0]
        capacity = _quantize_capacity(len(binding), capacity_factor)
        rng = np.random.default_rng(seed)
        gp, ga = G.init_gaussians(
            binding, n_faces, capacity, sh_degree=config.sh_degree,
            gaussian_counts=counts if config.gaussian_init_type == "scaled" else None,
            rng=rng,
        )
        print(f"Avatar init: {len(binding)} gaussians over {n_faces} remesh faces "
              f"(capacity {capacity})")

        deform_net = make_deform_net(config)
        R = config.uv_resolution
        dummy = jnp.zeros((2, R, R, 3 + 2 * 12))
        deform_params = deform_net.init(jax.random.PRNGKey(seed), dummy)["params"]

        # flame parameter bank over train+test(+target) timesteps (load_meshes,
        # cap4d_gaussian_model.py:167-199)
        meshes = scene.train_meshes + scene.test_meshes
        base_rot = (scene.tgt_meshes[0]["rot"] if scene.tgt_meshes
                    else meshes[0]["rot"])
        meshes = meshes + scene.tgt_meshes
        T = len(meshes)
        bank = variant.build_bank(meshes, base_rot)
        neck = jnp.zeros((T, 3), jnp.float32)

        zeros_like_tree = lambda t: jax.tree.map(jnp.zeros_like, t)
        moments = {
            "gauss_m": zeros_like_tree(gp), "gauss_v": zeros_like_tree(gp),
            "deform_m": zeros_like_tree(deform_params), "deform_v": zeros_like_tree(deform_params),
            "neck_m": jnp.zeros_like(neck), "neck_v": jnp.zeros_like(neck),
        }

        return cls(
            variant=variant, uv=uv, config=config, opt=opt_params,
            gauss_params=gp, gauss_aux=ga, deform_params=deform_params,
            neck_weight=neck, flame_bank=bank, moments=moments,
            lpips=lpips or LPIPS(params=None),
            spatial_lr_scale=float(getattr(scene, "cameras_extent", 1.0)),
        )

    @classmethod
    def create_smpl(
        cls,
        scene: SceneInfo,
        model_params: Dict[str, Any],
        opt_params: Dict[str, Any],
        smpl_asset_dir: str | Path = "data/assets/smpl",
        capacity_factor: float = 1.1,
        lpips: Optional[LPIPS] = None,
        seed: int = 0,
    ) -> "AvatarTrainer":
        """SMPL full-body variant (SMPLGaussianModel, cap4d_gaussian_model.py:458+):
        uv_resolution fixed at 256 in the reference, deform net gated off,
        static neck."""
        from cap4d_tpu.smpl.avatar import build_smpl_variant
        from cap4d_tpu.smpl.model import build_smpl_model, load_smpl_pkl

        config = FlameAvatarConfig(
            uv_resolution=model_params.get("uv_resolution", 256),
            n_unet_layers=model_params["n_unet_layers"],
            use_expr_mask=model_params.get("use_expr_mask", False),
            static_neck=model_params.get("static_neck", True),
            use_lower_jaw=False,
            n_gaussians_init=model_params["n_gaussians_init"],
            n_points_per_triangle=model_params["n_points_per_triangle"],
            sh_degree=model_params["sh_degree"],
            gaussian_init_type=model_params.get("gaussian_init_type", "scaled"),
        )
        smpl_model = build_smpl_model(
            load_smpl_pkl(Path(smpl_asset_dir) / "SMPL_NEUTRAL.pkl"))
        variant = build_smpl_variant(smpl_model, smpl_asset_dir, config.uv_resolution)
        uv = variant.uv

        from cap4d_tpu.smpl.avatar import load_smpl_template

        tv, *_ = load_smpl_template(smpl_asset_dir)
        binding, counts = allocate_gaussians(
            uv, jnp.asarray(tv), config.n_gaussians_init, config.n_points_per_triangle)
        n_faces = uv.remesh_faces.shape[0]
        capacity = _quantize_capacity(len(binding), capacity_factor)
        gp, ga = G.init_gaussians(
            binding, n_faces, capacity, sh_degree=config.sh_degree,
            gaussian_counts=counts if config.gaussian_init_type == "scaled" else None,
            rng=np.random.default_rng(seed),
        )
        print(f"SMPL avatar init: {len(binding)} gaussians over {n_faces} faces "
              f"(capacity {capacity})")

        deform_net = make_deform_net(config)
        R = config.uv_resolution
        deform_params = deform_net.init(
            jax.random.PRNGKey(seed), jnp.zeros((2, R, R, 3 + 2 * 12)))["params"]

        meshes = scene.train_meshes + scene.test_meshes
        base_rot = (scene.tgt_meshes[0].get("rot", np.zeros(3)) if scene.tgt_meshes
                    else meshes[0].get("rot", np.zeros(3)))
        meshes = meshes + scene.tgt_meshes
        bank = variant.build_bank(meshes, base_rot)
        neck = jnp.zeros((len(meshes), 3), jnp.float32)

        zeros_like_tree = lambda t: jax.tree.map(jnp.zeros_like, t)
        moments = {
            "gauss_m": zeros_like_tree(gp), "gauss_v": zeros_like_tree(gp),
            "deform_m": zeros_like_tree(deform_params),
            "deform_v": zeros_like_tree(deform_params),
            "neck_m": jnp.zeros_like(neck), "neck_v": jnp.zeros_like(neck),
        }
        return cls(
            variant=variant, uv=uv, config=config, opt=opt_params,
            gauss_params=gp, gauss_aux=ga, deform_params=deform_params,
            neck_weight=neck, flame_bank=bank, moments=moments,
            lpips=lpips or LPIPS(params=None),
            spatial_lr_scale=float(getattr(scene, "cameras_extent", 1.0)),
        )

    def grow_capacity(self, new_capacity: int) -> None:
        """Enlarge the padded gaussian store (recompile boundary).

        The store starts tight (capacity_factor 1.1) because binning/sort cost
        scales with the PADDED length; when densification runs out of free
        slots (n_dropped > 0) the trainer grows and the step functions
        recompile once."""
        C = self.gauss_params.xyz.shape[0]
        assert new_capacity > C
        pad = new_capacity - C

        def pad_arr(a, fill=0.0):
            shape = (pad,) + a.shape[1:]
            return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)], axis=0)

        gp = self.gauss_params
        self.gauss_params = G.GaussianParams(
            xyz=pad_arr(gp.xyz),
            features_dc=pad_arr(gp.features_dc),
            features_rest=pad_arr(gp.features_rest),
            scaling=pad_arr(gp.scaling),
            rotation=jnp.concatenate(
                [gp.rotation,
                 jnp.tile(jnp.asarray([1.0, 0, 0, 0], gp.rotation.dtype), (pad, 1))]),
            opacity=pad_arr(gp.opacity),
        )
        aux = self.gauss_aux
        self.gauss_aux = G.GaussianAux(
            active=pad_arr(aux.active, False),
            binding=pad_arr(aux.binding),
            binding_counter=aux.binding_counter,
            max_radii2d=pad_arr(aux.max_radii2d),
            xyz_gradient_accum=pad_arr(aux.xyz_gradient_accum),
            denom=pad_arr(aux.denom),
        )
        for key in ("gauss_m", "gauss_v"):
            m = self.moments[key]
            self.moments[key] = G.GaussianParams(
                **{f: pad_arr(getattr(m, f)) for f in
                   ("xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity")})
        if self._render_fns:
            self._render_fns.clear()
        if self._render_compiled:
            self._render_compiled.clear()
        print(f"Grew gaussian capacity {C} -> {new_capacity}")

    # ------------------------------------------------------------- mesh state

    def mesh_at_timestep(self, timestep: int, params=None, neck_weight=None):
        """Face frames for one timestep (select_mesh_by_timestep)."""
        deform_params = params if params is not None else self.deform_params
        neck = neck_weight if neck_weight is not None else self.neck_weight
        bank = self.flame_bank
        t = jnp.asarray(timestep)
        offset = jnp.zeros(3) if self.config.static_neck else neck[t]
        return self.variant.mesh_props(
            make_deform_net(self.config), deform_params, bank, t, offset)

    # ------------------------------------------------------------- train step

    def _build_train_step(self, width: int, height: int, sh_degree: int,
                          capacity: Optional[int] = None, _raw: bool = False):
        """Jitted full train iteration. ``capacity`` sizes capacity-derived
        static knobs when compiling for a store growth that hasn't been
        applied yet (the state args are then abstract, see step_compiler).
        ``_raw`` returns the unjitted python step for :meth:`_build_train_chunk`
        to wrap in a scan."""
        cfg = self.config
        opt = self.opt
        variant = self.variant
        deform_net = make_deform_net(cfg)
        lpips = self.lpips
        static_neck = cfg.static_neck

        backend = resolve_raster_backend(self.raster_backend)
        raster = make_raster(
            self.raster_backend, width, height, sh_degree,
            self.max_per_tile, self.max_tiles_per_gaussian,
            max_valid_pairs=self._auto_valid_pairs(capacity),
            **self._active_ext_budgets(capacity),
            big_tiles_per_gaussian=self.big_tiles_per_gaussian,
            # training: 1×1 base + budgeted 2×2 ext level — the VJP's
            # m-sized unsort gather/sorts dominate the step, and inactive
            # capacity padding stops paying 4 base slots (see gsplat_pallas)
            base_side=1,
        )

        def loss_fn(trainable, aux, bank, cam, gt_image, mask, t, lambda_lpips):
            gp, dp, neck = trainable["gauss"], trainable["deform"], trainable["neck"]
            offset = jnp.zeros(3) if static_neck else neck[t]
            with jax.named_scope("flame_mesh"):
                mesh = variant.mesh_props(deform_net, dp, bank, t, offset)
            with jax.named_scope("world_pack"):
                if opt["lambda_relative_deform"] != 0:
                    # the regularizer needs neutral world positions too —
                    # one fused (C, 32) row gather covers both packs
                    world, neutral_world = G.world_gaussians_pack2(
                        gp, aux, mesh.face_pack, mesh.neutral_pack)
                else:
                    world = G.world_gaussians_pack(gp, aux, mesh.face_pack)
                    neutral_world = None
            m2d_zero = trainable["m2d"]
            with jax.named_scope("raster"):
                if backend == "pallas":  # channel path: no minor-dim-3/4 arrays
                    out = raster(
                        None, None, None,
                        world["opacities"], world["sh"], cam["rt"], cam["K"],
                        means2d_offset=m2d_zero, mask=aux.active,
                        channels=world,
                    )
                else:
                    out = raster(
                        jnp.stack(world["means3d_ch"], axis=-1),
                        jnp.stack(world["quats_ch"], axis=-1),
                        jnp.stack(world["scales_ch"], axis=-1),
                        world["opacities"], world["sh"], cam["rt"], cam["K"],
                        means2d_offset=m2d_zero, mask=aux.active,
                    )
            image = out["render"] * mask[..., None]
            gt = gt_image * mask[..., None]
            # photometric losses run CHANNEL-FIRST: (H, W, 3) arrays are
            # 42×-padded by the TPU tiling, so the SSIM blur stack on them
            # moved ~15 ms/step of padded bytes
            image_cf = jnp.transpose(image, (2, 0, 1))
            gt_cf = jnp.transpose(gt, (2, 0, 1))

            losses = {}
            with jax.named_scope("photometric"):
                ssim_v = ssim(image_cf, gt_cf, channel_first=True)
                lam_ds = opt["lambda_dssim"]
                # the reference hands the photometric objective over to LPIPS
                # as λ_lpips ramps to 1 (train.py:152-165); without LPIPS
                # weights the (1-λ) down-weighting would drive the
                # photometric loss to ZERO — keep l1/SSIM at full weight
                photo_w = (1 - lambda_lpips) if lpips.available else 1.0
                losses["l1"] = l1_loss(image_cf, gt_cf) * (1 - lam_ds) * photo_w
                losses["ssim"] = (1 - ssim_v) * lam_ds * photo_w
                if lpips.available:
                    losses["lpips"] = opt["w_lpips"] * lambda_lpips * lpips(image, gt)

            vis = out["visibility"] & aux.active
            nvis = jnp.clip(jnp.sum(vis), 1)
            with jax.named_scope("regularizers"):
                # xyz / scale regularizers (train.py:166-175, non-metric variants)
                xyz_pen = jax.nn.relu(safe_norm(gp.xyz, axis=1) - opt["threshold_xyz"])
                losses["xyz"] = jnp.sum(xyz_pen * vis) / nvis * opt["lambda_xyz"]
                if opt["lambda_scale"] != 0:
                    sc_pen = jax.nn.relu(jnp.exp(gp.scaling) - opt["threshold_scale"])
                    sc_pen = safe_norm(sc_pen, axis=1)
                    losses["scale"] = jnp.sum(sc_pen * vis) / nvis * opt["lambda_scale"]
                if opt["lambda_laplacian"] != 0:
                    losses["lap"] = laplacian_loss(mesh.deform_output) * opt["lambda_laplacian"]
                if opt["lambda_relative_deform"] != 0:
                    losses["deform"] = relative_deformation_loss_ch(
                        world["means3d_ch"], neutral_world["means3d_ch"],
                        active=aux.active,
                        n_active=aux.n_active) * opt["lambda_relative_deform"]
                if opt["lambda_relative_rot"] != 0:
                    losses["rot"] = relative_rotation_loss_pack(
                        mesh.neutral_pack, mesh.face_pack) * opt["lambda_relative_rot"]
                if opt["lambda_neck"] != 0 and not static_neck:
                    losses["neck"] = safe_norm(neck[t]) * opt["lambda_neck"]

            total = sum(losses.values())
            return total, (losses, image, out)

        sls = self.spatial_lr_scale

        def step(gp, dp, neck, aux, moments, bank, cam, gt_image, mask, t,
                 iteration, adam_step):
            # lr schedules + LPIPS ramp computed IN-STEP from the iteration
            # scalar (train.py:117,152-158 semantics): the loop then ships
            # one f32 per iteration where it used to build and upload five —
            # each tiny host→device transfer pays tunnel latency, measured
            # as a large share of the 10k-fit's wall gap vs the bench rate.
            lrs = {
                "xyz": expon_lr_traced(
                    iteration,
                    opt["position_lr_init"] * sls,
                    opt["position_lr_final"] * sls,
                    lr_delay_mult=opt["position_lr_delay_mult"],
                    max_steps=opt["position_lr_max_steps"]),
                "deform": expon_lr_traced(
                    iteration,
                    opt["deform_net_lr_init"], opt["deform_net_lr_final"],
                    lr_delay_mult=opt["deform_net_lr_delay_mult"],
                    max_steps=opt["deform_net_lr_max_steps"]),
                "neck": expon_lr_traced(
                    iteration,
                    opt["neck_lr_init"], opt["neck_lr_final"],
                    lr_delay_mult=opt["neck_lr_delay_mult"],
                    max_steps=opt["neck_lr_max_steps"]),
            }
            ramp_span = max(
                opt["lpips_linear_end"] - opt["lpips_linear_start"], 1)
            lambda_lpips = jnp.clip(
                (iteration - opt["lpips_linear_start"]) / ramp_span,
                0.0, 1.0) * opt["lambda_lpips_end"]
            trainable = {"gauss": gp, "deform": dp, "neck": neck,
                         "m2d": jnp.zeros((gp.xyz.shape[0], 2))}
            with jax.named_scope("value_and_grad"):
                (total, (losses, image, out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(trainable, aux, bank, cam, gt_image,
                                           mask, t, lambda_lpips)

            # densification stats from the means2d gradient (train.py:230-233)
            with jax.named_scope("densify_stats"):
                aux = G.add_densification_stats(
                    aux, grads["m2d"], out["visibility"], out["radii"])

            # per-group Adam (cap4d_gaussian_model.py:381-416)
            adam_scope = jax.named_scope("adam")
            adam_scope.__enter__()
            g_lr = {"xyz": lrs["xyz"], "features_dc": opt["feature_lr"],
                    "features_rest": opt["feature_lr"] / 20.0,
                    "opacity": opt["opacity_lr"], "scaling": opt["scaling_lr"],
                    "rotation": opt["rotation_lr"]}
            new_p, new_m, new_v = {}, {}, {}
            for name in g_lr:
                p = getattr(gp, name)
                gr = getattr(grads["gauss"], name)
                gr = gr * aux.active[(...,) + (None,) * (gr.ndim - 1)]
                np_, nm, nv = adam_update(
                    p, gr, getattr(moments["gauss_m"], name),
                    getattr(moments["gauss_v"], name), adam_step, g_lr[name])
                new_p[name], new_m[name], new_v[name] = np_, nm, nv
            gp = G.GaussianParams(**new_p)
            gauss_m = G.GaussianParams(**new_m)
            gauss_v = G.GaussianParams(**new_v)

            def upd(p, g, m, v):
                return adam_update(p, g, m, v, adam_step, lrs["deform"],
                                   wd=opt["deform_net_w_decay"])

            leaves_p, treedef = jax.tree_util.tree_flatten(dp)
            leaves_g = treedef.flatten_up_to(grads["deform"])
            leaves_m = treedef.flatten_up_to(moments["deform_m"])
            leaves_v = treedef.flatten_up_to(moments["deform_v"])
            updated = [upd(p, g, m, v) for p, g, m, v in
                       zip(leaves_p, leaves_g, leaves_m, leaves_v)]
            dp = jax.tree_util.tree_unflatten(treedef, [u[0] for u in updated])
            deform_m = jax.tree_util.tree_unflatten(treedef, [u[1] for u in updated])
            deform_v = jax.tree_util.tree_unflatten(treedef, [u[2] for u in updated])

            # neck: SparseAdam — only the observed row updates (eps 1e-18)
            if not static_neck:
                g_neck = grads["neck"]
                row_mask = (jnp.abs(g_neck).sum(axis=-1, keepdims=True) > 0)
                n_p, n_m, n_v = adam_update(
                    neck, g_neck, moments["neck_m"], moments["neck_v"],
                    adam_step, lrs["neck"], eps=1e-18)
                neck = jnp.where(row_mask, n_p, neck)
                neck_m = jnp.where(row_mask, n_m, moments["neck_m"])
                neck_v = jnp.where(row_mask, n_v, moments["neck_v"])
            else:
                neck_m, neck_v = moments["neck_m"], moments["neck_v"]

            adam_scope.__exit__(None, None, None)
            moments = {"gauss_m": gauss_m, "gauss_v": gauss_v,
                       "deform_m": deform_m, "deform_v": deform_v,
                       "neck_m": neck_m, "neck_v": neck_v}
            losses["total"] = total
            # truncation counters ride the same fetch as the losses so the
            # train loop can raise the caps (VERDICT: no silent truncation)
            losses["n_truncated"] = out["n_truncated"]
            losses["n_truncated_depth"] = out["n_truncated_depth"]
            return gp, dp, neck, aux, moments, losses, image

        if _raw:
            return step
        return jax.jit(step, donate_argnums=(0, 1, 2, 3, 4))

    def _build_train_chunk(self, width: int, height: int, sh_degree: int,
                           capacity: Optional[int] = None,
                           chunk_len: int = 10):
        """CHUNK_LEN train iterations in ONE jitted dispatch: a lax.scan over
        the single step, pulling each iteration's camera from a device-resident
        bank. Through the TPU tunnel every per-step host artifact — the
        executable dispatch RPC and the tiny iteration/adam scalar uploads —
        costs wall latency the device never sees (the 10k default fit measured
        ~9 it/s wall against a 14.6 it/s device step); one dispatch + one
        13-int upload per 10 steps amortises all of it.

        Signature: chunk(gp, dp, neck, aux, moments, bank, cam_bank, meta)
        - cam_bank: {"rt": (N,4,4) f32, "K": (N,3,3) f32,
                     "gt": (N,H,W,3) uint8 (PNG-exact; /255 in-step),
                     "mask": (N,H,W) f32, "t": (N,) int32} — device-resident,
          passed by handle (no per-dispatch transfer).
        - meta: (3 + chunk_len,) int32 = [iteration0, adam_step0, k_eff,
          cam_idx...]. Lanes j >= k_eff still execute (their camera index is
          a repeat) but their state update is discarded by a select — partial
          chunks only occur at eval/densify boundaries, so the waste is a few
          seconds per fit and buys a single compiled executable per
          (w, h, sh) key instead of one per chunk length.

        Returns (gp, dp, neck, aux, moments, losses) with every loss entry
        stacked (chunk_len,); the per-step rendered image is not returned
        (the loop discards it, and stacking 10 frames is 8 MB of dead HBM
        traffic per dispatch)."""
        step = self._build_train_step(width, height, sh_degree,
                                      capacity=capacity, _raw=True)

        def chunk(gp, dp, neck, aux, moments, bank, cam_bank, meta):
            it0 = meta[0].astype(jnp.float32)
            adam0 = meta[1].astype(jnp.float32)
            k_eff = meta[2]
            idx = meta[3:]

            def body(state, xs):
                j, k_idx = xs
                cam = {"rt": cam_bank["rt"][k_idx], "K": cam_bank["K"][k_idx]}
                gt = cam_bank["gt"][k_idx].astype(jnp.float32) / 255.0
                mask = cam_bank["mask"][k_idx]
                t = cam_bank["t"][k_idx]
                fj = j.astype(jnp.float32)
                out = step(*state, bank, cam, gt, mask, t,
                           it0 + fj, adam0 + fj)
                new_state, losses = out[:5], out[5]
                keep = j < k_eff
                new_state = jax.tree.map(
                    lambda n, o: jnp.where(keep, n, o), new_state, state)
                return new_state, losses

            xs = (jnp.arange(len(idx), dtype=jnp.int32), idx)
            state, losses = jax.lax.scan(
                body, (gp, dp, neck, aux, moments), xs)
            return state + (losses,)

        return jax.jit(chunk, donate_argnums=(0, 1, 2, 3, 4))

    # ---------------------------------------------------------------- render

    def _make_render_fn(self, width: int, height: int, sh_deg: int,
                        compute_depth: bool, clip: bool):
        """The (unjitted) single-frame inference program shared by
        render_camera (jit) and render_cameras_dp (shard_map per device)."""
        variant = self.variant
        cfg = self.config
        deform_net = make_deform_net(cfg)
        static_neck = cfg.static_neck

        raster = make_raster(
            self.raster_backend, width, height, sh_deg,
            self.max_per_tile, self.max_tiles_per_gaussian,
            render_depth=compute_depth,
            max_valid_pairs=self._auto_valid_pairs(),
            **self._active_ext_budgets(),
            big_tiles_per_gaussian=self.big_tiles_per_gaussian)

        backend = resolve_raster_backend(self.raster_backend)

        def fn(gp, aux, dp, neck, bank, rt, K, t, far):
            offset = jnp.zeros(3) if static_neck else neck[t]
            mesh = variant.mesh_props(deform_net, dp, bank, t, offset)
            if clip:
                verts = mesh.verts
                center = (jnp.max(verts, axis=0)
                          + jnp.min(verts, axis=0)) / 2.0
                # rigid extrinsics: inv(rt)[:3,3] == -R^T t
                cam_pos = -jnp.matmul(
                    rt[:3, :3].T, rt[:3, 3],
                    precision=jax.lax.Precision.HIGHEST)
                far = jnp.linalg.norm(center - cam_pos) + 0.025
            world = G.world_gaussians_pack(gp, aux, mesh.face_pack)
            if backend == "pallas":
                return raster(
                    None, None, None,
                    world["opacities"], world["sh"], rt, K,
                    far=far, mask=aux.active, channels=world,
                )
            return raster(
                jnp.stack(world["means3d_ch"], axis=-1),
                jnp.stack(world["quats_ch"], axis=-1),
                jnp.stack(world["scales_ch"], axis=-1),
                world["opacities"], world["sh"], rt, K,
                far=far, mask=aux.active,
            )

        return fn

    def render_cameras_dp(self, cams, timesteps, mesh,
                          sh_degree: Optional[int] = None,
                          compute_depth: bool = False, clip: bool = False):
        """One frame per device of a 1-D ``("dp",)`` mesh in a single SPMD
        dispatch — the TPU-native answer to animation render throughput.

        Frames are embarrassingly parallel (the reference renders them
        sequentially on one GPU, gaussianavatars/animate.py:127-164): the
        camera/timestep batch shards over the dp axis while the avatar
        parameters replicate, so nothing crosses ICI after the initial
        placement and per-chip FPS scales ~linearly with the slice size.
        The per-device body is the SAME program render_camera jits."""
        D = int(mesh.devices.size)
        assert len(cams) == D and len(timesteps) == D, (len(cams), D)
        cam0 = cams[0]
        assert all(c.width == cam0.width and c.height == cam0.height
                   for c in cams), "dp frame batch needs one resolution"
        sh_deg = self.active_sh_degree if sh_degree is None else sh_degree
        if self._render_fns is None:
            object.__setattr__(self, "_render_fns", {})
        key = (cam0.width, cam0.height, sh_deg, compute_depth, clip, "dp", D)
        if key not in self._render_fns:
            fn = self._make_render_fn(
                cam0.width, cam0.height, sh_deg, compute_depth, clip)

            def body(gp, aux, dp, neck, bank, rt, K, t, far):
                out = fn(gp, aux, dp, neck, bank,
                         rt[0], K[0], t[0], far[0])
                return jax.tree.map(lambda x: x[None], out)

            P = jax.sharding.PartitionSpec
            rep, shd = P(), P("dp")
            sharded = jax.shard_map(
                body, mesh=mesh,
                in_specs=(rep, rep, rep, rep, rep, shd, shd, shd, shd),
                out_specs=shd, check_vma=False)
            self._render_fns[key] = jax.jit(sharded)
        rts = jnp.stack([jnp.asarray(c.rt) for c in cams])
        Ks = jnp.stack([jnp.asarray(c.intrinsics) for c in cams])
        ts = jnp.asarray(list(timesteps), jnp.int32)
        fars = jnp.full((D,), 1e3, jnp.float32)
        return self._render_fns[key](
            self.gauss_params, self.gauss_aux, self.deform_params,
            self.neck_weight, self.flame_bank, rts, Ks, ts, fars)

    def prewarm_render_async(self, cam, timestep: int, sh_degrees) -> None:
        """AOT-compile the eval-render executables for ``cam`` off-thread.

        The first ``testing_iterations`` eval otherwise pays its XLA compile
        inline mid-fit (measured as most of the round-4 steady-rate gap).
        COMPILE-ONLY, exactly like AsyncStepCompiler: ``lower(avals)``
        never executes and never reads buffer contents, so it cannot race
        the chunk jit's buffer donation (an executing prewarm died with
        "Array has been deleted", and a concurrent background EXECUTION
        breaks this image's relay backend outright with INVALID_ARGUMENT —
        both observed round 5). Avals (weak types included) are captured on
        the calling thread; ``render_camera`` prefers the finished
        executable and falls back to its own jit on any aval mismatch."""
        import threading

        if self._render_fns is None:
            object.__setattr__(self, "_render_fns", {})
        if self._render_compiled is None:
            object.__setattr__(self, "_render_compiled", {})
        args = (self.gauss_params, self.gauss_aux, self.deform_params,
                self.neck_weight, self.flame_bank, jnp.asarray(cam.rt),
                jnp.asarray(cam.intrinsics), jnp.asarray(int(timestep)),
                jnp.float32(1e3))
        avals = jax.tree.map(lambda x: x.aval, args)

        def run():
            for sh in sh_degrees:
                try:
                    key = (cam.width, cam.height, sh, False, False)
                    if key not in self._render_fns:
                        self._render_fns[key] = jax.jit(self._make_render_fn(
                            cam.width, cam.height, sh, False, False))
                    self._render_compiled[key] = (
                        self._render_fns[key].lower(*avals).compile())
                except Exception as e:  # never kill the fit over a prewarm
                    print(f"[prewarm] eval render compile failed: {e}")

        threading.Thread(target=run, name="evalprewarm", daemon=True).start()

    def render_camera(self, cam, timestep: int, sh_degree: Optional[int] = None,
                      compute_depth: bool = False, clip: bool = False):
        """Inference render of one camera (gsplat_renderer.py:20-86).

        The whole path (FLAME→deform→frames→splatting) is one cached jit per
        (resolution, sh degree, depth, clip) signature. The far-plane clip
        (animate.py:110-117 semantics: head center distance + 2.5 cm) is
        computed IN-GRAPH from the posed mesh — a host-side computation here
        would force a device sync per frame and serialise the async dispatch
        pipeline the animation loop relies on."""
        far = 1e3
        sh_deg = self.active_sh_degree if sh_degree is None else sh_degree
        if self._render_fns is None:
            object.__setattr__(self, "_render_fns", {})
        key = (cam.width, cam.height, sh_deg, compute_depth, clip)
        if key not in self._render_fns:
            self._render_fns[key] = jax.jit(self._make_render_fn(
                cam.width, cam.height, sh_deg, compute_depth, clip))
        args = (self.gauss_params, self.gauss_aux, self.deform_params,
                self.neck_weight, self.flame_bank, jnp.asarray(cam.rt),
                jnp.asarray(cam.intrinsics), jnp.asarray(timestep),
                jnp.float32(far))
        compiled = (self._render_compiled or {}).get(key)
        if compiled is not None:
            try:
                return compiled(*args)
            except Exception:   # aval drift vs the prewarm — use the jit path
                del self._render_compiled[key]
        return self._render_fns[key](*args)

    # ------------------------------------------------------------ checkpoints

    def capture(self) -> Dict[str, Any]:
        """Checkpoint contents (cap4d_gaussian_model.py:443-456)."""
        to_np = lambda t: jax.tree.map(np.asarray, t)
        bank = {k: np.asarray(v) for k, v in self.flame_bank.items()}
        return {
            # identity params for reenactment (cap4d_gaussian_model.py:443-450);
            # SMPL banks carry betas instead of shape
            "shape": bank.get("shape", bank.get("betas")),
            "base_rot": bank["base_rot"],
            "bank": bank,
            "deform_net": to_np(self.deform_params),
            "gaussians": {
                "active_sh_degree": self.active_sh_degree,
                "params": to_np(self.gauss_params),
                "aux": to_np(self.gauss_aux),
                "moments": to_np(self.moments),
            },
            "neck_weight": np.asarray(self.neck_weight),
        }

    def save_checkpoint(self, model_path: Path, iteration: int) -> Path:
        """chkpnt{iter}.pth in the reference's torch.save layout (train.py:248)
        so reference animate.py/train.py can load it directly; framework-only
        state rides along under an ignored extra key. Falls back to a plain
        pickle of the native capture when torch is unavailable."""
        path = Path(model_path) / f"chkpnt{iteration}.pth"
        try:
            from cap4d_tpu.avatar.convert_ref import save_reference_checkpoint

            return save_reference_checkpoint(self, path, iteration)
        except ImportError:
            with open(path, "wb") as fh:
                pickle.dump((self.capture(), iteration), fh)
            return path

    def restore(self, chkpt: Dict[str, Any]) -> None:
        shape_key = "shape" if "shape" in self.flame_bank else "betas"
        self.flame_bank[shape_key] = jnp.asarray(chkpt["shape"])
        self.flame_bank["base_rot"] = jnp.asarray(chkpt["base_rot"])
        self.deform_params = jax.tree.map(jnp.asarray, chkpt["deform_net"])
        g = chkpt["gaussians"]
        self.active_sh_degree = g["active_sh_degree"]
        self.gauss_params = jax.tree.map(jnp.asarray, g["params"])
        self.gauss_aux = jax.tree.map(jnp.asarray, g["aux"])
        self.moments = jax.tree.map(jnp.asarray, g["moments"])
        self.neck_weight = jnp.asarray(chkpt["neck_weight"])


def search_max_iteration(model_path: Path) -> Tuple[Optional[int], Optional[Path]]:
    """Newest chkpnt*.pth by iteration number (utils/system_utils.py:26-37)."""
    ckpts = list(Path(model_path).glob("chkpnt*.pth"))
    if not ckpts:
        return None, None
    best = max(ckpts, key=lambda p: int(p.stem.replace("chkpnt", "")))
    return int(best.stem.replace("chkpnt", "")), best
