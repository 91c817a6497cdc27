"""Multi-chip / multi-host scaling: channel x time sharding over a Mesh.

The reference has no distributed capability at all (SURVEY.md section 2.4);
its implicit "pipeline parallelism" (GNU Radio block threads working on
PDUs in flight) is replaced by data parallelism over a 2-D device mesh:

- axis "channel": independent receive channels, embarrassingly parallel;
- axis "time": a continuous stream is split into hop-aligned blocks per
  shard. Every 120 s window overlaps the next block by fl-hop samples
  (111 s), so each shard fetches a *right halo* of fl-hop samples from its
  neighbor with lax.ppermute over ICI before windowing — the overlap-save
  equivalent of the reference's ring-buffer window builder
  (lib/sliding_window_stream_to_pdu_impl.cc:113-135).

Global spot statistics are reduced with psum. Decoded payloads stay
sharded; the host gathers only the 7-byte messages.

The time axis is circular within one step (the last shard's halo comes
from the first shard). A streaming driver keeps continuity by overlapping
consecutive steps by one hop-aligned block, exactly like the single-host
SlidingWindow does between pushes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uwspr_tpu.config import PipelineConfig
from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder


def make_mesh(n_channel: int, n_time: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_channel * n_time, \
        f"need {n_channel * n_time} devices, have {len(devices)}"
    devs = np.array(devices[: n_channel * n_time]).reshape(n_channel, n_time)
    return Mesh(devs, axis_names=("channel", "time"))


class ShardedDecoder:
    """Decode (channels, time_samples) arrays sharded over a mesh.

    time_samples per shard must be a multiple of the window hop; each shard
    decodes block_len // hop windows.
    """

    def __init__(self, config: PipelineConfig | None = None,
                 mesh: Mesh | None = None):
        self.config = config or PipelineConfig()
        self.mesh = mesh or make_mesh(len(jax.devices()), 1)
        self.decoder = DeviceDecoder(self.config)
        self._step = None

    @property
    def fl(self) -> int:
        return self.config.stream.fl

    @property
    def hop(self) -> int:
        return self.config.stream.shift * self.config.stream.fs

    def _build(self, ch_local: int, block_len: int):
        fl, hop = self.fl, self.hop
        halo = fl - hop
        n_win = block_len // hop
        n_time = self.mesh.shape["time"]
        decode = self.decoder._decode_window

        def per_channel(ext_row):
            starts = jnp.arange(n_win) * hop
            idx = starts[:, None] + jnp.arange(fl)[None, :]
            windows = ext_row[idx]                      # (n_win, fl)
            return jax.lax.map(decode, windows)

        def shard_fn(x_ri):                     # (ch_l, 2, block_len) float32
            lead = x_ri[:, :, :halo]
            if n_time > 1:
                perm = [(i, (i - 1) % n_time) for i in range(n_time)]
                recv = jax.lax.ppermute(lead, "time", perm=perm)
            else:
                recv = lead
            ext_ri = jnp.concatenate([x_ri, recv], axis=2)
            ext = jax.lax.complex(ext_ri[:, 0], ext_ri[:, 1])  # (ch_l, T+halo)
            out = jax.lax.map(per_channel, ext)         # dict of (ch_l, n_win, ...)
            n_local = out["success"].sum()
            n_global = jax.lax.psum(n_local, ("channel", "time"))
            return out, n_global

        # check_vma=False: the decoder's internal lax.scan/while_loop carries
        # start from literal constants, which the varying-axis checker would
        # require pvary annotations on at every init; execution is unaffected.
        fn = jax.shard_map(shard_fn, mesh=self.mesh,
                           in_specs=P("channel", None, "time"),
                           out_specs=(P("channel", "time"), P()),
                           check_vma=False)
        return jax.jit(fn)

    def decode(self, x: np.ndarray):
        """x: (channels, time_samples) complex64, divisible by mesh shape.

        Returns (outputs dict of global arrays (channels, windows, C, ...),
        total_spots scalar).
        """
        n_ch, n_t = self.mesh.shape["channel"], self.mesh.shape["time"]
        channels, total = x.shape
        assert channels % n_ch == 0
        assert total % n_t == 0
        block_len = total // n_t
        assert block_len % self.hop == 0, \
            "per-shard block length must be a multiple of the hop"
        key = (channels // n_ch, block_len)
        if self._step is None or self._step[0] != key:
            self._step = (key, self._build(*key))
        sharding = NamedSharding(self.mesh, P("channel", None, "time"))
        x = np.asarray(x)
        x_ri = np.stack([x.real.astype(np.float32),
                         x.imag.astype(np.float32)], axis=1)
        xs = jax.device_put(jnp.asarray(x_ri), sharding)
        return self._step[1](xs)


@functools.lru_cache(maxsize=None)
def cpu_mesh(n_channel: int, n_time: int) -> Mesh:
    """Virtual CPU-device mesh for tests/CI (xla_force_host_platform...)."""
    return make_mesh(n_channel, n_time)


__all__ = ["make_mesh", "ShardedDecoder", "cpu_mesh"]
