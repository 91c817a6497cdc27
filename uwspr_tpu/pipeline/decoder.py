"""End-to-end window decoder: coarse search -> fine sync -> Fano -> text.

One WindowDecoder call reproduces the reference's FDR ->
sync_and_demodulate -> WSPR_unpacker chain for a single 45000-sample
window (SURVEY.md section 3.2), with every per-candidate stage batched:

- coarse candidates  (coarse.search.CoarseSearch)
- staged (lag, freq, drift) refinement (demod.finesync.FineSync)
- soft symbols for all 17 jiggled shifts at once
- sync/rms gates, then one batched Fano call over every gated
  (candidate x jiggle) lane (fec backend configurable)
- first-success-in-jiggle-order selection == the reference's sequential
  retry loop (impl.cc:457-482)
- message unpack + hashtable update (protocol.messages)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from uwspr_tpu.coarse.search import CoarseSearch, MODE_NONLINEAR
from uwspr_tpu.config import PipelineConfig
from uwspr_tpu.demod.finesync import FineSync
from uwspr_tpu.fec import fano_decode_batch
from uwspr_tpu.protocol.constants import FANO_METTAB, deinterleave
from uwspr_tpu.protocol.messages import HashTable, Unpacked, unpack_message


@dataclass
class Spot:
    """One decoded frame."""

    message: str
    payload: bytes            # 7-byte packed message
    freq: float               # baseband Hz
    snr: float                # 6 Hz SNR, dB
    sync: float
    shift: int                # samples
    drift: float
    mode: int                 # 0 linear, 1 nonlinear
    slm_params: tuple = ()
    candidate: int = 0
    jiggle: int = 0
    fano_metric: int = 0      # final path metric (reference Fano.cc:240-248)
    fano_cycles: int = 0      # forward-look count consumed
    unpacked: Unpacked | None = None
    pass_index: int = 0       # multipass: which cancellation pass found it
    osd: int = 0              # 0 = Fano decode; else the OSD search order
                              # that produced it (deep-SNR fallback —
                              # cross-check against known callsigns)


@dataclass
class DecodeResult:
    spots: list[Spot] = field(default_factory=list)
    n_candidates: int = 0
    n_worth_a_try: int = 0
    n_fano_attempts: int = 0


class WindowDecoder:
    def __init__(self, config: PipelineConfig | None = None,
                 hashtable: HashTable | None = None,
                 timers: "StageTimers | None" = None):
        from uwspr_tpu.utils.timers import StageTimers
        self.config = config or PipelineConfig()
        self.coarse = CoarseSearch(self.config.coarse)
        self.fine = FineSync(self.config.demod, self.config.coarse)
        self.hashtable = hashtable if hashtable is not None else HashTable()
        # per-stage wall-clock accounting — the first-class version of the
        # reference's commented-out wsprd timing block
        # (lib/WSPR_unpacker_impl.cc:68-74): tcandidates/tsync/tfano
        self.timers = timers if timers is not None else StageTimers()

    def __call__(self, window: np.ndarray) -> DecodeResult:
        cfg = self.config
        with self.timers.stage("coarse"):
            cands = self.coarse(window)
        result = DecodeResult(n_candidates=cands.n)
        if cands.n == 0:
            return result

        with self.timers.stage("finesync"):
            ref = self.fine.refine(window, cands)
        result.n_worth_a_try = int(ref.worth_a_try.sum())
        if result.n_worth_a_try == 0:
            return result

        with self.timers.stage("soft_symbols"):
            symbols, sync2, rms = self.fine.soft_symbols(window, cands, ref)
        C, J, _ = symbols.shape
        gate = (ref.worth_a_try[:, None]
                & (sync2 > cfg.demod.minsync2)
                & (rms > cfg.demod.minrms))                     # (C, J)

        flat_syms = deinterleave(symbols.reshape(C * J, 162))
        active = gate.reshape(C * J)
        result.n_fano_attempts = int(active.sum())
        if result.n_fano_attempts == 0:
            return result
        with self.timers.stage("fano"):
            success, data, metric, cycles, maxnp = fano_decode_batch(
                flat_syms, FANO_METTAB, active, backend=cfg.fano_backend,
                delta=cfg.demod.fano_delta, maxcycles=cfg.demod.maxcycles)
        success = success.reshape(C, J)
        data = data.reshape(C, J, -1)
        metric = metric.reshape(C, J)
        cycles = cycles.reshape(C, J)

        for c in range(C):
            if not ref.worth_a_try[c]:
                continue
            js = np.flatnonzero(success[c])
            if len(js) == 0:
                if cfg.demod.osd_depth > 0:
                    spot = self._osd_fallback(c, cands, ref, flat_syms,
                                              gate, sync2)
                    if spot is not None:
                        result.spots.append(spot)
                continue
            j = int(js[0])                  # first success in jiggle order
            payload = bytes(data[c, j, :7])
            unpacked = unpack_message(payload, self.hashtable)
            text = unpacked.text if unpacked is not None else ""
            result.spots.append(Spot(
                message=text,
                payload=payload,
                freq=float(ref.freq[c]),   # refined, = reference's freq1
                                           # (sync_and_demodulate logs the
                                           # post-refinement frequency)
                snr=float(cands.snr[c]),
                sync=float(sync2[c, j]),
                shift=int(ref.shift[c]),
                drift=float(ref.drift[c]),
                mode=int(cands.mode[c]),
                slm_params=tuple(float(v) for v in cands.slm_params[c])
                if cands.mode[c] == MODE_NONLINEAR else (),
                candidate=c,
                jiggle=j,
                fano_metric=int(metric[c, j]),
                fano_cycles=int(cycles[c, j]),
                unpacked=unpacked,
            ))
        return result


    def _osd_fallback(self, c, cands, ref, flat_syms, gate, sync2):
        """Ordered-statistics decode of candidate c's two best gated
        lanes — the deep-SNR fallback when every Fano retry failed.
        Acceptance = the calibrated cross-jiggle-agreement / margin rule
        (fec/osd.accept_osd) + protocol unpacking; the spot is tagged
        with the OSD order (Spot.osd)."""
        if not gate[c].any():
            return None
        from uwspr_tpu.fec.osd import accept_osd
        cfg = self.config
        J = gate.shape[1]
        j, payload = accept_osd(flat_syms[c * J:(c + 1) * J], gate[c],
                                sync2[c], cfg.demod)
        if payload is None:
            return None
        unpacked = unpack_message(payload, self.hashtable)
        if unpacked is None:
            return None
        return Spot(
            message=unpacked.text,
            payload=payload,
            freq=float(ref.freq[c]),
            snr=float(cands.snr[c]),
            sync=float(sync2[c, j]),
            shift=int(ref.shift[c]),
            drift=float(ref.drift[c]),
            mode=int(cands.mode[c]),
            slm_params=tuple(float(v) for v in cands.slm_params[c])
            if cands.mode[c] == MODE_NONLINEAR else (),
            candidate=int(c),
            jiggle=j,
            unpacked=unpacked,
            osd=int(cfg.demod.osd_depth),
        )


def decode_c2_file(path, config: PipelineConfig | None = None) -> DecodeResult:
    """Convenience: decode one .c2 capture (the reference's golden path)."""
    from uwspr_tpu.io.c2file import read_c2
    return WindowDecoder(config)(read_c2(path).samples)


__all__ = ["WindowDecoder", "DecodeResult", "Spot", "decode_c2_file"]
