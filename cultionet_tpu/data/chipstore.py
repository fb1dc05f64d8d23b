"""Python bindings for the native chipstore loader (ctypes).

The high-throughput data path: chips packed into one mmap'd binary file,
batches assembled by C++ worker threads with shuffled-epoch prefetch
(native/chipstore.cpp), yielded as device-ready Batch pytrees. This replaces
per-file joblib/npz reads + Python worker threads on the hot training path;
the file-per-chip ChipDataset remains the flexible/interchange format.
"""

import ctypes
import struct
import subprocess
import typing as T
from pathlib import Path

import numpy as np

from .batch import Batch

_MAGIC = b"CTS1"
_VERSION = 1
_VERSION_PACKED = 2
_META_FLOATS = 8

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_SOURCE = _NATIVE_DIR / "chipstore.cpp"
_LIB_PATH = _NATIVE_DIR / "libchipstore.so"

_lib: T.Optional[ctypes.CDLL] = None


def _build_library() -> Path:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        str(_SOURCE),
        "-o",
        str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or (
        _SOURCE.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        _build_library()
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.cs_open.restype = ctypes.c_void_p
    lib.cs_open.argtypes = [ctypes.c_char_p]
    lib.cs_num_chips.restype = ctypes.c_int64
    lib.cs_num_chips.argtypes = [ctypes.c_void_p]
    lib.cs_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
    lib.cs_version.restype = ctypes.c_uint32
    lib.cs_version.argtypes = [ctypes.c_void_p]
    lib.cs_read_batch.restype = ctypes.c_int
    lib.cs_read_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.cs_prefetch_start.restype = ctypes.c_int
    lib.cs_prefetch_start.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.cs_next_slot.restype = ctypes.c_int64
    lib.cs_next_slot.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.cs_slot_ptrs.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.cs_release_slot.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.cs_prefetch_stop.argtypes = [ctypes.c_void_p]
    lib.cs_close.argtypes = [ctypes.c_void_p]

    _lib = lib
    return lib


def write_chipstore(
    path: T.Union[str, Path],
    batches: T.Iterable[Batch],
    packed: bool = False,
) -> Path:
    """Pack an iterable of single-chip Batches into one chipstore file.

    ``packed=True`` writes version-2 records: x and bdist quantized to
    int16 x 10000 (the packing the reference stores chips in natively,
    data/constant.py:1) and y as int16 — half the bytes of float32, and
    half the host->HBM transfer when dequantized on device
    (``Batch.dequantize`` / automatic inside the train/eval steps).
    """
    from .constant import SCALE_FACTOR

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    chips = list(batches)
    if not chips:
        raise ValueError("No chips to write")
    first = chips[0]
    _, t, h, w, c = first.x.shape
    has_labels = first.y is not None

    def quantize(arr) -> np.ndarray:
        arr = np.asarray(arr)
        if np.issubdtype(arr.dtype, np.integer):
            return np.ascontiguousarray(arr, dtype="<i2")
        if arr.size and float(np.abs(arr).max()) > 2.0:
            # float-typed but already x10000-packed values (e.g. v1 chips
            # loaded as float): cast without double-scaling
            return np.round(np.clip(arr, -32768, 32767)).astype("<i2")
        return np.round(
            np.clip(arr * SCALE_FACTOR, -32768, 32767)
        ).astype("<i2")

    with open(path, "wb") as dst:
        dst.write(
            struct.pack(
                "<4sIQIIIIII",
                _MAGIC,
                _VERSION_PACKED if packed else _VERSION,
                len(chips),
                t,
                h,
                w,
                c,
                1 if has_labels else 0,
                0,
            )
        )
        for chip in chips:
            assert chip.x.shape == (1, t, h, w, c), "chip shape mismatch"
            if packed:
                dst.write(quantize(chip.x[0]).tobytes())
            else:
                dst.write(
                    np.ascontiguousarray(chip.x[0], dtype="<f4").tobytes()
                )
            if has_labels:
                if packed:
                    dst.write(
                        np.ascontiguousarray(
                            chip.y[0], dtype="<i2"
                        ).tobytes()
                    )
                    dst.write(quantize(chip.bdist[0]).tobytes())
                else:
                    dst.write(
                        np.ascontiguousarray(chip.y[0], dtype="<i4").tobytes()
                    )
                    dst.write(
                        np.ascontiguousarray(
                            chip.bdist[0], dtype="<f4"
                        ).tobytes()
                    )
            meta = np.zeros(_META_FLOATS, dtype="<f4")
            for i, name in enumerate(("left", "bottom", "right", "top")):
                value = getattr(chip, name)
                if value is not None:
                    meta[i] = float(np.asarray(value)[0])
            meta[4] = (meta[1] + meta[3]) / 2.0  # lat
            meta[5] = (meta[0] + meta[2]) / 2.0  # lon
            dst.write(meta.tobytes())
    return path


class ChipStore:
    """mmap'd chipstore reader."""

    def __init__(self, path: T.Union[str, Path]):
        self.lib = load_library()
        self.handle = self.lib.cs_open(str(path).encode())
        if not self.handle:
            raise IOError(f"Cannot open chipstore {path}")
        dims = (ctypes.c_uint32 * 5)()
        self.lib.cs_dims(self.handle, dims)
        self.t, self.h, self.w, self.c, has_labels = (
            int(dims[0]),
            int(dims[1]),
            int(dims[2]),
            int(dims[3]),
            int(dims[4]),
        )
        self.has_labels = bool(has_labels)
        self.num_chips = int(self.lib.cs_num_chips(self.handle))
        self.version = int(self.lib.cs_version(self.handle))
        self.packed = self.version == _VERSION_PACKED
        # Per-field record dtypes (version 2 = int16-packed, see
        # native/chipstore.cpp header comment).
        self.x_dtype = np.int16 if self.packed else np.float32
        self.y_dtype = np.int16 if self.packed else np.int32
        self.bdist_dtype = np.int16 if self.packed else np.float32
        self._prefetching = False

    def __len__(self) -> int:
        return self.num_chips

    def _alloc(self, n: int):
        x = np.empty((n, self.t, self.h, self.w, self.c), dtype=self.x_dtype)
        y = (
            np.empty((n, self.h, self.w), dtype=self.y_dtype)
            if self.has_labels
            else None
        )
        bdist = (
            np.empty((n, self.h, self.w), dtype=self.bdist_dtype)
            if self.has_labels
            else None
        )
        meta = np.empty((n, _META_FLOATS), dtype="float32")
        return x, y, bdist, meta

    @staticmethod
    def _ptr(a, ctype=None):
        if a is None:
            return None
        return ctypes.c_void_p(a.ctypes.data)

    def _to_batch(self, x, y, bdist, meta, n) -> Batch:
        return Batch(
            x=x[:n],
            y=None if y is None else y[:n],
            bdist=None if bdist is None else bdist[:n],
            left=meta[:n, 0],
            bottom=meta[:n, 1],
            right=meta[:n, 2],
            top=meta[:n, 3],
            lat=meta[:n, 4],
            lon=meta[:n, 5],
        )

    def read_batch(self, indices: T.Sequence[int]) -> Batch:
        n = len(indices)
        idx = np.asarray(indices, dtype="int64")
        x, y, bdist, meta = self._alloc(n)
        rc = self.lib.cs_read_batch(
            self.handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            self._ptr(x),
            self._ptr(y),
            self._ptr(bdist),
            self._ptr(meta),
        )
        if rc != 0:
            raise IndexError("chip index out of range")
        return self._to_batch(x, y, bdist, meta, n)

    def iter_prefetched(
        self,
        batch_size: int,
        seed: int = 42,
        num_threads: int = 2,
        max_queue: int = 4,
        num_batches: T.Optional[int] = None,
        copy: bool = True,
    ) -> T.Iterator[Batch]:
        """Shuffled, endlessly-reshuffling prefetched batches assembled by
        the native worker threads into a zero-copy slot ring.

        With ``copy=False`` the yielded Batch arrays alias the native slot
        memory and are only valid until the next iteration (consume them —
        e.g. ``jax.device_put`` — within the loop body). ``copy=True``
        (default) detaches them."""
        if num_batches is None:
            num_batches = max(1, self.num_chips // batch_size)
        rc = self.lib.cs_prefetch_start(
            self.handle, batch_size, seed, num_threads, max_queue
        )
        if rc != 0:
            raise RuntimeError("prefetch already running")

        hw = self.h * self.w
        x_shape = (batch_size, self.t, self.h, self.w, self.c)
        try:
            for _ in range(num_batches):
                count = ctypes.c_int64(0)
                slot = self.lib.cs_next_slot(
                    self.handle, ctypes.byref(count)
                )
                if slot < 0:
                    break
                ptrs = (ctypes.c_void_p * 4)()
                self.lib.cs_slot_ptrs(self.handle, slot, ptrs)

                def view(ptr, dtype, shape):
                    if not ptr:
                        return None
                    nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
                    buf = ctypes.cast(
                        ptr, ctypes.POINTER(ctypes.c_uint8 * nbytes)
                    )
                    arr = np.frombuffer(
                        buf.contents, dtype=dtype
                    ).reshape(shape)
                    return arr

                n = int(count.value)
                x = view(ptrs[0], self.x_dtype, x_shape)[:n]
                y = (
                    view(
                        ptrs[1], self.y_dtype, (batch_size, self.h, self.w)
                    )
                    if self.has_labels
                    else None
                )
                bdist = (
                    view(
                        ptrs[2],
                        self.bdist_dtype,
                        (batch_size, self.h, self.w),
                    )
                    if self.has_labels
                    else None
                )
                meta = view(ptrs[3], np.float32, (batch_size, _META_FLOATS))
                if copy:
                    x = np.array(x)
                    y = None if y is None else np.array(y[:n])
                    bdist = None if bdist is None else np.array(bdist[:n])
                    meta = np.array(meta)
                try:
                    yield self._to_batch(
                        x,
                        None if y is None else y[:n],
                        None if bdist is None else bdist[:n],
                        meta,
                        n,
                    )
                finally:
                    self.lib.cs_release_slot(self.handle, slot)
        finally:
            self.lib.cs_prefetch_stop(self.handle)

    def close(self) -> None:
        if self.handle:
            self.lib.cs_close(self.handle)
            self.handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def build_chipstore_from_dataset(
    dataset,
    path: T.Union[str, Path],
    packed: bool = True,
) -> Path:
    """Pack a ChipDataset's raw chips (UNscaled/unaugmented — the step
    dequantizes, augments, and normalizes on device) into one store file.

    The cache file name is keyed on a content hash of the *membership*
    (the sorted chip file list) plus the store format, and carries the
    process index, so: (a) a re-split with the same chip count but
    different train membership builds a fresh store instead of silently
    training on stale (val-leaking) membership, and (b) multi-host runs
    sharing one filesystem never race on a single file — each process
    packs its own stripe under its own name. Rebuilds in place when any
    member chip is newer than the store.
    """
    import hashlib

    path = Path(path)
    files = list(dataset.files)
    key_src = "\n".join(sorted(str(f) for f in files))
    key = hashlib.sha1(
        f"v2|packed={int(packed)}|{key_src}".encode()
    ).hexdigest()[:12]
    try:
        import jax

        proc = jax.process_index()
    except Exception:  # pragma: no cover - jax always present in practice
        proc = 0
    path = path.with_name(f"{path.stem}-p{proc}-{key}{path.suffix}")
    if path.exists() and files:
        newest = max(f.stat().st_mtime for f in files)
        if path.stat().st_mtime >= newest:
            return path
    chips = (Batch.from_file(f) for f in files)
    return write_chipstore(path, chips, packed=packed)


class ChipstoreLoader:
    """Epoch-iterable train loader over a packed chipstore: C++ worker
    threads assemble shuffled int16 batches into the zero-copy slot ring;
    each batch is device_put (optionally mesh-sharded / multi-host
    assembled) and dequantized + augmented + normalized INSIDE the
    compiled train step. This is the fast path that closes the
    loader-vs-step throughput gap of the per-file python pipeline."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        cache_path: T.Union[str, Path],
        seed: int = 42,
        num_threads: int = 4,
        sharding=None,
    ):
        self.batch_size = batch_size
        self.seed = seed
        self.num_threads = num_threads
        self.sharding = sharding
        self.path = build_chipstore_from_dataset(dataset, cache_path)
        store = ChipStore(self.path)
        try:
            self.num_chips = len(store)
        finally:
            store.close()
        self._epoch = 0

    def __len__(self) -> int:
        return max(1, self.num_chips // self.batch_size)

    def __iter__(self):
        import jax

        store = ChipStore(self.path)
        self._epoch += 1
        try:
            for batch in store.iter_prefetched(
                batch_size=self.batch_size,
                seed=self.seed + self._epoch,
                num_threads=self.num_threads,
                num_batches=len(self),
                copy=False,
            ):
                if self.sharding is not None:
                    if jax.process_count() > 1:
                        from ..parallel.mesh import global_batch_from_local

                        yield global_batch_from_local(batch, self.sharding)
                    else:
                        yield jax.tree_util.tree_map(
                            lambda leaf: jax.device_put(
                                leaf, self.sharding
                            ),
                            batch,
                        )
                else:
                    yield jax.device_put(batch)
        finally:
            store.close()
