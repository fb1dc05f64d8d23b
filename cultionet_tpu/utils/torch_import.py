"""Import the PyTorch reference model for numeric parity + checkpoint import.

The reference package (jgrss/cultionet, expected at ``REFERENCE_CULTIONET``
or ``/root/reference/src``) cannot import in a minimal image: it depends on
lightning, natten (CUDA), geowombat/rasterio/pyproj (GDAL stack), tsaug,
ray/dask, etc. Everything except ``natten`` is only touched at import time
by the model files we need (models/nunet.py, models/cultionet.py,
nn/modules/*), so those are satisfied with permissive stub modules.

``natten`` is different — it IS the math. ``_TorchNeighborhoodAttention2D``
below is a faithful PyTorch implementation of natten 0.17's
``NeighborhoodAttention2D`` (clamped-window neighborhood attention, same
parameter tree: qkv/proj Linear), so the reference model both constructs and
*computes* correctly, giving this framework a golden oracle for forward
parity (reference nn/modules/convolution.py:336-353) and a live source of
``state_dict``s for the torch->Flax checkpoint importer (torch_params.py).

Nothing here imports jax; torch is cpu-only in this image.
"""

import importlib
import os
import sys
import types
import typing as T

REFERENCE_PATH = os.environ.get(
    "REFERENCE_CULTIONET", "/root/reference/src"
)

# Top-level packages stubbed at any submodule depth (only when the real
# package is absent from the image).
_STUB_ROOTS = [
    "lightning",
    "torchmetrics",
    "geowombat",
    "xarray",
    "pyproj",
    "rasterio",
    "geopandas",
    "pygrts",
    "shapely",
    "dask",
    "ray",
    "tsaug",
    "frozendict",
    "skimage",
    "kornia",
    "tqdm",
    "rich",
    "rich_argparse",
    "decorator",
    "retry",
    "pandas",
    "torchvision",
    "joblib",
    "affine",
    "cv2",
    "opencv-python",
]


class _AnyClass:
    """Permissive base: subclassable, callable, attribute-forgiving."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return _AnyClass()


def _make_stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package so submodule imports resolve

    def module_getattr(attr, _name=name):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return _AnyClass

    mod.__getattr__ = module_getattr
    return mod


class _StubFinder:
    """meta_path finder creating permissive stubs for any submodule of the
    registered roots (same pattern as the torch_geometric chip-reading shim
    at cultionet_tpu/data/batch.py)."""

    def __init__(self, roots: T.Sequence[str]):
        self.roots = set(roots)

    def find_spec(self, fullname, path=None, target=None):
        import importlib.machinery

        root = fullname.split(".", 1)[0]
        if root not in self.roots:
            return None

        finder = self

        class _Loader:
            def create_module(self, spec):
                return _make_stub(spec.name)

            def exec_module(self, module):
                pass

        return importlib.machinery.ModuleSpec(
            fullname, _Loader(), is_package=True
        )


def _install_torch_natten() -> None:
    """A real (torch, CPU) natten: clamped-window neighborhood attention."""
    import numpy as np
    import torch
    import torch.nn as nn

    def _axis_neighbor_indices(length, kernel_size, dilation):
        # Same table as cultionet_tpu.ops.natten._axis_neighbor_indices
        # (reference semantics: NATTEN clamped window with dilation).
        idx = np.empty((length, kernel_size), dtype=np.int64)
        half = kernel_size // 2
        for i in range(length):
            coset = i % dilation
            pos = i // dilation
            coset_len = (length - coset + dilation - 1) // dilation
            start = min(max(pos - half, 0), coset_len - kernel_size)
            idx[i] = coset + dilation * (start + np.arange(kernel_size))
        return torch.from_numpy(idx)

    def _neighbors(x, kernel_size, dilation):
        # x: (B, H, W, N, D) -> (B, H, W, k*k, N, D)
        _, height, width = x.shape[:3]
        idx_h = _axis_neighbor_indices(height, kernel_size, dilation)
        idx_w = _axis_neighbor_indices(width, kernel_size, dilation)
        nbr = x[:, idx_h.reshape(-1)].reshape(
            x.shape[0], height, kernel_size, width, *x.shape[3:]
        )
        nbr = nbr[:, :, :, idx_w.reshape(-1)].reshape(
            x.shape[0], height, kernel_size, width, kernel_size, *x.shape[3:]
        )
        return nbr.permute(0, 1, 3, 2, 4, 5, 6).reshape(
            x.shape[0], height, width, kernel_size * kernel_size, *x.shape[3:]
        )

    def na2d_qk(q, k, kernel_size, dilation=1, **_):
        # q, k: (B, heads, H, W, D) (natten layout) -> (B, heads, H, W, k*k)
        q = q.permute(0, 2, 3, 1, 4)  # (B, H, W, N, D)
        k = k.permute(0, 2, 3, 1, 4)
        k_nbr = _neighbors(k, kernel_size, dilation)  # (B,H,W,kk,N,D)
        attn = torch.einsum("bhwnd,bhwknd->bhwnk", q, k_nbr)
        return attn.permute(0, 3, 1, 2, 4)  # (B, N, H, W, kk)

    def na2d_av(attn, v, kernel_size, dilation=1, **_):
        attn = attn.permute(0, 2, 3, 1, 4)  # (B, H, W, N, kk)
        v = v.permute(0, 2, 3, 1, 4)
        v_nbr = _neighbors(v, kernel_size, dilation)
        out = torch.einsum("bhwnk,bhwknd->bhwnd", attn, v_nbr)
        return out.permute(0, 3, 1, 2, 4)  # (B, N, H, W, D)

    def na2d(q, k, v, kernel_size, dilation=1, scale=None, **_):
        # (B, H, W, N, D) in/out (natten functional layout)
        head_dim = q.shape[-1]
        scale = head_dim**-0.5 if scale is None else scale
        k_nbr = _neighbors(k, kernel_size, dilation)
        v_nbr = _neighbors(v, kernel_size, dilation)
        attn = torch.einsum("bhwnd,bhwknd->bhwnk", q * scale, k_nbr)
        weights = attn.softmax(dim=-1)
        return torch.einsum("bhwnk,bhwknd->bhwnd", weights, v_nbr)

    class NeighborhoodAttention2D(nn.Module):
        """Parameter-compatible stand-in for natten 0.17's module
        (qkv/proj Linear tree, (B, H, W, C) in/out)."""

        def __init__(
            self,
            dim: int,
            num_heads: int,
            kernel_size: int,
            dilation: int = 1,
            rel_pos_bias: bool = False,
            qkv_bias: bool = True,
            qk_scale: T.Optional[float] = None,
            attn_drop: float = 0.0,
            proj_drop: float = 0.0,
        ):
            super().__init__()
            assert not rel_pos_bias, "rel_pos_bias stub not implemented"
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = qk_scale or self.head_dim**-0.5
            self.kernel_size = kernel_size
            self.dilation = dilation
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            b, h, w, c = x.shape
            qkv = self.qkv(x).reshape(
                b, h, w, 3, self.num_heads, self.head_dim
            )
            q, k, v = qkv.unbind(dim=3)  # (B, H, W, N, D)
            k_nbr = _neighbors(k, self.kernel_size, self.dilation)
            v_nbr = _neighbors(v, self.kernel_size, self.dilation)
            attn = torch.einsum(
                "bhwnd,bhwknd->bhwnk", q * self.scale, k_nbr
            )
            attn = self.attn_drop(attn.softmax(dim=-1))
            out = torch.einsum("bhwnk,bhwknd->bhwnd", attn, v_nbr)
            out = out.reshape(b, h, w, c)
            return self.proj_drop(self.proj(out))

    natten = types.ModuleType("natten")
    natten.NeighborhoodAttention2D = NeighborhoodAttention2D
    functional = types.ModuleType("natten.functional")
    functional.na2d = na2d
    functional.na2d_qk = na2d_qk
    functional.na2d_av = na2d_av
    natten.functional = functional
    sys.modules["natten"] = natten
    sys.modules["natten.functional"] = functional


_installed = False


def install_reference_stubs() -> None:
    """Register permissive stubs for the reference's heavy dependencies and
    the real torch natten stand-in. Idempotent. Packages actually present in
    the image are never shadowed."""
    global _installed
    if _installed:
        return
    if "natten" not in sys.modules or not hasattr(
        sys.modules["natten"], "NeighborhoodAttention2D"
    ):
        _install_torch_natten()
    missing = []
    for name in _STUB_ROOTS:
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
        except ImportError:
            missing.append(name)
    sys.meta_path.append(_StubFinder(missing))
    _installed = True


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def load_reference_module(module: str):
    """Import a module from the reference package with stubs installed,
    e.g. ``load_reference_module('cultionet.models.nunet')``."""
    install_reference_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return importlib.import_module(module)
