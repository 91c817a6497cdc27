"""ctypes bindings for the native streaming windower (stream_native.cc).

Compiled on demand with g++ (cached next to this file), like the native
Fano backend. Callers should catch ImportError/OSError and fall back to
the Python SlidingWindow.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "stream_native.cc"
_LIB = _DIR / "libuwspr_stream.so"


def _configure(lib: ctypes.CDLL) -> None:
    i64, i32, p = ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p
    lib.uwspr_stream_create.argtypes = [i32, i64, i64, i32]
    lib.uwspr_stream_create.restype = p
    lib.uwspr_stream_destroy.argtypes = [p]
    lib.uwspr_stream_push.argtypes = [p, p, i64]
    lib.uwspr_stream_ready.argtypes = [p]
    lib.uwspr_stream_ready.restype = i64
    lib.uwspr_stream_dropped.argtypes = [p]
    lib.uwspr_stream_dropped.restype = i64
    lib.uwspr_stream_buffered.argtypes = [p, i32]
    lib.uwspr_stream_buffered.restype = i64
    lib.uwspr_stream_pop_batch.argtypes = [p, p, p, i64]
    lib.uwspr_stream_pop_batch.restype = i64
    lib.uwspr_stream_num_threads.restype = i32


def _load() -> ctypes.CDLL:
    from uwspr_tpu.utils.native_build import load_native
    return load_native(_SRC, _LIB, _configure)


class NativeWindower:
    """Multichannel ring-buffer windower backed by the C++ runtime.

    push() ingests planar (channels, 2, n) float32 (or complex) blocks;
    pop_batch() extracts up to max_windows ready (2, fl) windows straight
    into a batched device-feed array. Window semantics are identical to
    pipeline.stream.SlidingWindow (tested in tests/test_native_stream.py).
    """

    def __init__(self, n_channels: int, fl: int, hop: int,
                 capacity_windows: int = 2):
        self._lib = _load()
        self.n_channels = n_channels
        self.fl = fl
        self.hop = hop
        self.capacity_windows = capacity_windows
        self._h = self._lib.uwspr_stream_create(
            n_channels, fl, hop, capacity_windows)
        if not self._h:
            raise OSError("uwspr_stream_create failed")

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.uwspr_stream_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    @staticmethod
    def to_planar(samples: np.ndarray) -> np.ndarray:
        """(channels, n) complex or (channels, 2, n) float32 -> planar."""
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = np.atleast_2d(samples)
            return np.ascontiguousarray(
                np.stack([samples.real, samples.imag], axis=1),
                dtype=np.float32)
        assert samples.ndim == 3 and samples.shape[1] == 2, samples.shape
        return np.ascontiguousarray(samples, dtype=np.float32)

    def push(self, samples: np.ndarray) -> int:
        """Ingest one block for every channel; returns windows now ready."""
        planar = self.to_planar(samples)
        assert planar.shape[0] == self.n_channels, planar.shape
        self._lib.uwspr_stream_push(self._h, planar.ctypes.data,
                                    planar.shape[2])
        return self.ready

    @property
    def ready(self) -> int:
        return int(self._lib.uwspr_stream_ready(self._h))

    @property
    def dropped(self) -> int:
        """Samples lost to ring overflow (backpressure observability)."""
        return int(self._lib.uwspr_stream_dropped(self._h))

    def buffered(self, channel: int) -> int:
        return int(self._lib.uwspr_stream_buffered(self._h, channel))

    def pop_batch(self, max_windows: int):
        """-> (ri (W, 2, fl) float32, channels (W,) int32), W <= max_windows."""
        out = np.empty((max_windows, 2, self.fl), dtype=np.float32)
        chans = np.empty(max_windows, dtype=np.int32)
        n = int(self._lib.uwspr_stream_pop_batch(
            self._h, out.ctypes.data, chans.ctypes.data, max_windows))
        return out[:n], chans[:n]


def num_threads() -> int:
    return _load().uwspr_stream_num_threads()


__all__ = ["NativeWindower", "num_threads"]
