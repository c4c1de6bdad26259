"""jax.profiler trace capture helper (SURVEY §5.1: "JAX cost analysis +
jax.profiler traces"; reference counterpart utils/utils_modelsummary.py:27
reports per-model FLOPs/activations — the trace adds per-op time
attribution, which the reference gets from torch.autograd.profiler users).

Usage, from any CLI:

    from kair_tpu.utils.profiling import trace
    with trace("/tmp/prof"):          # no-op when dirname is falsy
        run_the_hot_thing()

Then `tensorboard --logdir /tmp/prof` (or xprof) renders the timeline.
`summarize_trace` gives a CLI-friendly per-op table straight from the
captured .xplane.pb without needing tensorboard installed.
"""

from __future__ import annotations

import contextlib
import glob
import os
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str], annotate: bool = True):
    """Capture a jax.profiler trace into ``log_dir``; no-op if falsy."""
    if not log_dir:
        yield None
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def find_xplanes(log_dir: str):
    return sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.xplane.pb")))


def summarize_trace(log_dir: str, top: int = 25):
    """Best-effort per-op time table from the newest .xplane.pb.

    Parses the XSpace protobuf with a minimal hand-rolled varint walker
    (the tensorflow profiler proto stubs are not installed in this image).
    Returns a list of (name, total_us, count) sorted by time, or None if
    nothing parseable was captured.
    """
    paths = find_xplanes(log_dir)
    if not paths:
        return None
    data = open(paths[-1], "rb").read()
    try:
        return _xspace_op_times(data, top)
    except Exception:
        return None


# ---- minimal protobuf wire-format walk -------------------------------------
# XSpace: planes=1 -> XPlane{name=2, lines=3 -> XLine{events=4 ->
#   XEvent{metadata_id=1, duration_ps=3}}, event_metadata=4(map<int64,
#   XEventMetadata{id=1, name=2}>)}. NB event_metadata is field 4 and
#   stat_metadata is field 5 — reading 5 returns stat names ("flops",
#   "bytes_accessed", "_p"...) and produced the garbage table the r5
#   bench_profile stage printed.

def _varint(buf, i):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value_bytes_or_int)."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fn, wt, v
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fn, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fn, wt, int.from_bytes(buf[i:i + 4], "little")
            i += 4
        elif wt == 1:
            yield fn, wt, int.from_bytes(buf[i:i + 8], "little")
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def _xspace_op_times(data: bytes, top: int, device_only: bool = True):
    """Per-op (name, total_us, count) from an XSpace, device planes only
    (plane name contains 'TPU'/'GPU'/'device:'); falls back to every plane
    when no device plane parsed (e.g. CPU-only captures)."""
    per_plane = []                     # (plane_name, {name: (ps, count)})
    for fn, wt, plane in _fields(data):
        if fn != 1 or wt != 2:
            continue
        pname, meta, events = "", {}, []
        for pf, pw, pv in _fields(plane):
            if pf == 2 and pw == 2:           # XPlane.name
                pname = pv.decode("utf-8", "replace")
            elif pf == 4 and pw == 2:         # event_metadata map entry
                mid, mname = None, None
                for mf, mw, mv in _fields(pv):
                    if mf == 1 and mw == 0:
                        mid = mv
                    elif mf == 2 and mw == 2:  # XEventMetadata
                        for ef, ew, ev in _fields(mv):
                            if ef == 1 and ew == 0:
                                mid = ev
                            elif ef == 2 and ew == 2:
                                mname = ev.decode("utf-8", "replace")
                if mid is not None and mname:
                    meta[mid] = mname
            elif pf == 3 and pw == 2:         # XLine
                for lf, lw, lv in _fields(pv):
                    if lf == 4 and lw == 2:   # XEvent
                        mid = dur = 0
                        for ef, ew, ev in _fields(lv):
                            if ef == 1 and ew == 0:
                                mid = ev
                            elif ef == 3 and ew == 0:
                                dur = ev
                        events.append((mid, dur))
        totals: dict = {}
        for mid, dur in events:
            name = meta.get(mid)
            if not name:
                continue
            t, c = totals.get(name, (0, 0))
            totals[name] = (t + dur, c + 1)
        if totals:
            per_plane.append((pname, totals))

    def is_device(nm):
        return ("TPU" in nm or "GPU" in nm or "/device:" in nm) \
            and "Host" not in nm
    chosen = [t for nm, t in per_plane if is_device(nm)] if device_only \
        else []
    if not chosen:
        chosen = [t for _, t in per_plane]
    merged: dict = {}
    for totals in chosen:
        for name, (t, c) in totals.items():
            mt, mc = merged.get(name, (0, 0))
            merged[name] = (mt + t, mc + c)
    rows = [(name, t / 1e6, c) for name, (t, c) in merged.items()]
    rows.sort(key=lambda r: -r[1])
    return rows[:top]


def print_trace_summary(log_dir: str, top: int = 25, printer=print):
    rows = summarize_trace(log_dir, top)
    if not rows:
        printer(f"profile: trace captured in {log_dir} (no parseable "
                "xplane — open with tensorboard/xprof)")
        return
    printer(f"profile: top {len(rows)} ops by device time ({log_dir})")
    for name, us, count in rows:
        printer(f"  {us:12.1f} us  x{count:<6d} {name[:90]}")
