"""Import helpers for using the READ-ONLY reference implementation as a test
oracle (never as a source of code). Torch CPU + einops are available in this
image; unavailable reference deps are stubbed just enough to import modules.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def enable_reference_imports() -> None:
    """Put /root/reference on sys.path with stubs for its missing deps."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # omegaconf is only touched by UNetModel.__init__ for a ListConfig isinstance
    # check (openaimodel.py:481-483) — a list alias suffices.
    _stub_module("omegaconf", OmegaConf=None, ListConfig=list)
    _stub_module("omegaconf.listconfig", ListConfig=list)
    if "omegaconf" in sys.modules and not hasattr(sys.modules["omegaconf"], "listconfig"):
        sys.modules["omegaconf"].listconfig = sys.modules["omegaconf.listconfig"]
    # decord is imported at module scope by cap4d/datasets/utils.py
    _stub_module("decord", VideoReader=None)
    # torchvision is only imported for make_grid (image logging) at
    # cap4d/mmdm/mmdm.py:6 — never on the loss/inference paths under test
    _stub_module("torchvision", utils=None)
    _stub_module("torchvision.utils", make_grid=None)
    import sys as _sys
    _sys.modules["torchvision"].utils = _sys.modules["torchvision.utils"]
    # pytorch_lightning is only a base class for the reference AutoencoderKL /
    # DDPM, plus the rank_zero_only decorator (ddpm.py:21)
    import torch

    _stub_module("pytorch_lightning", LightningModule=torch.nn.Module)
    _stub_module("pytorch_lightning.utilities", rank_zero=None)
    _stub_module("pytorch_lightning.utilities.rank_zero",
                 rank_zero_only=lambda fn: fn)
    import sys as _sys
    _sys.modules["pytorch_lightning"].utilities = _sys.modules["pytorch_lightning.utilities"]
    _sys.modules["pytorch_lightning.utilities"].rank_zero = _sys.modules["pytorch_lightning.utilities.rank_zero"]


class numpy_namespace_guard:
    """Undo the reference skinner's permanent deprecated-alias pollution of
    numpy (flowface/flame/flame.py:84-91), which breaks numpy.testing."""

    _NAMES = ["bool", "int", "float", "complex", "object", "unicode", "str"]

    def __enter__(self):
        import numpy as np
        self._saved = {n: np.__dict__.get(n, _MISSING) for n in self._NAMES}

    def __exit__(self, *exc):
        import numpy as np
        for n, v in self._saved.items():
            if v is _MISSING:
                if n in np.__dict__:
                    delattr(np, n)
            else:
                setattr(np, n, v)
        return False


_MISSING = object()
