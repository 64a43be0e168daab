"""Import helper for the reference torch implementation (parity oracles).

Stubs the reference's unavailable deps (hydra, iopath) so its *modeling*
modules import cleanly; we only instantiate modules with random weights to
produce golden activations — no reference code is executed in the framework
itself."""

import importlib.machinery
import sys
import types


def _stub(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def load_reference_sam2():
    for name in ["iopath", "iopath.common", "iopath.common.file_io",
                 "hydra", "hydra.core", "hydra.core.global_hydra"]:
        sys.modules.setdefault(name, _stub(name))
    sys.modules["iopath.common.file_io"].g_pathmgr = None
    sys.modules["hydra"].initialize_config_module = lambda *a, **k: None

    class _GH:
        @staticmethod
        def instance():
            class X:
                def is_initialized(self):
                    return True
            return X()

    sys.modules["hydra.core.global_hydra"].GlobalHydra = _GH

    # torchvision isn't installed: provide the three transforms the reference
    # uses (exact same math), and make torch.jit.script a no-op so the
    # reference's scripted Sequential still runs in eager mode.
    if "torchvision" not in sys.modules:
        import torch
        import torch.nn.functional as F

        torch.jit.script = lambda fn, *a, **k: fn

        class ToTensor:
            def __call__(self, img):
                import numpy as np
                arr = np.asarray(img)
                t = torch.from_numpy(arr.copy()).permute(2, 0, 1).float()
                return t / 255.0

        class Resize(torch.nn.Module):
            def __init__(self, size, **kw):
                super().__init__()
                self.size = size

            def forward(self, x):
                return F.interpolate(x[None], size=self.size, mode="bilinear",
                                     align_corners=False, antialias=True)[0]

        class Normalize(torch.nn.Module):
            def __init__(self, mean, std, **kw):
                super().__init__()
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def forward(self, x):
                return (x - self.mean) / self.std

        tv = _stub("torchvision")
        tvt = _stub("torchvision.transforms")
        tvt.ToTensor = ToTensor
        tvt.Resize = Resize
        tvt.Normalize = Normalize
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    # decord is unavailable; stub the two names the reference imports
    if "decord" not in sys.modules:
        dec = _stub("decord")
        dec.VideoReader = object
        dec.cpu = lambda *a, **k: None
        dec.bridge = types.SimpleNamespace(set_bridge=lambda *a, **k: None)
        sys.modules["decord"] = dec

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import sam2  # noqa: F401
    return sam2
