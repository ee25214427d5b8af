"""First-party XLA profile analysis: capture a trace, print a top-op table.

The reference has no profiling beyond wall-clock meters (SURVEY.md §5);
``jax.profiler`` produces xplane protobufs, but the tensorboard-plugin
converter chain is brittle (version skew between tensorflow/tensorboard/
protobuf broke it in three different ways in this environment). This module
parses the xplane directly — it is how the head-stacked attention-kernel
win was found (docs/KERNELS.md): per-op device time made the 2%-MXU
attention call stand out against 95%-of-peak matmuls.

Usage::

    from tae_tpu.utils.xprof import trace, top_ops
    with trace("/tmp/myprof"):
        f(x).block_until_ready()
    for row in top_ops("/tmp/myprof"):
        print(row["total_ms"], row["share"], row["name"])

or ``python -m tae_tpu.utils.xprof /tmp/myprof``.
"""

from __future__ import annotations

import collections
import contextlib
import glob
from typing import Any, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``jax.profiler`` trace context (works on CPU and TPU)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _load_xspace(log_dir: str):
    """Parse the newest xplane.pb under a profiler log dir."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {log_dir!r} — did the "
                                "trace context run any device work?")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # pragma: no cover - layout differs across TF builds
        from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def top_ops(log_dir: str, device_substr: str = "TPU",
            line_substr: str = "XLA Ops", limit: int | None = 25
            ) -> list[dict[str, Any]]:
    """Aggregate per-op device time from a trace.

    Returns rows ``{"name", "total_ms", "count", "share"}`` sorted by total
    duration; ``share`` is the fraction of the line's total. Falls back to
    the host plane when no device plane matches (CPU-only traces).
    """
    xs = _load_xspace(log_dir)
    planes = [p for p in xs.planes if device_substr in p.name and p.lines]
    if not planes:
        planes = [p for p in xs.planes
                  if p.name.startswith("/host:CPU") and p.lines]
    if not planes:
        raise ValueError("no populated device/host planes in trace")
    plane = planes[0]
    meta = {k: v.name for k, v in plane.event_metadata.items()}
    # exact-prefix match so "XLA Ops" does NOT pick up "Async XLA Ops" —
    # async copy-start durations overlap compute and would double-count
    lines = [ln for ln in plane.lines if ln.name.startswith(line_substr)] \
        or plane.lines
    dur = collections.Counter()
    cnt = collections.Counter()
    for ln in lines:
        for e in ln.events:
            name = meta.get(e.metadata_id, "?")
            dur[name] += e.duration_ps
            cnt[name] += 1
    total = sum(dur.values()) or 1
    return [
        {"name": name, "total_ms": d / 1e9, "count": cnt[name],
         "share": d / total}
        for name, d in dur.most_common(limit)
    ]


def top_op_groups(log_dir: str, device_substr: str = "TPU",
                  line_substr: str = "XLA Ops", limit: int = 25
                  ) -> list[dict[str, Any]]:
    """Like :func:`top_ops` but aggregated by op *signature* — the
    ``= <shape> <kind>(<operand shapes>)`` part with the SSA value name and
    layout/memory annotations stripped. Unstacked serving layouts give every
    per-layer kernel a distinct op name; a per-instance top list then shows
    15-21 copies of the same kernel and hides the tail (how the r2 profile
    missed the non-matmul residue this view was built to expose)."""
    import re

    # limit=None: group over EVERY op instance — truncating first would
    # both misstate shares and hide the long tail this view exists to show
    rows = top_ops(log_dir, device_substr, line_substr, limit=None)
    sig_dur: collections.Counter = collections.Counter()
    sig_cnt: collections.Counter = collections.Counter()
    for r in rows:
        sig = r["name"].split("= ", 1)[-1]
        sig = re.sub(r"\{[^}]*\}", "", sig)       # strip layout annotations
        sig = re.sub(r"%[\w.\-]+", "", sig)       # strip operand value names
        sig = re.sub(r"\s+", " ", sig).strip()[:140]
        sig_dur[sig] += r["total_ms"]
        sig_cnt[sig] += r["count"]
    total = sum(sig_dur.values()) or 1.0
    return [
        {"name": sig, "total_ms": d, "count": sig_cnt[sig], "share": d / total}
        for sig, d in sig_dur.most_common(limit)
    ]


def print_top_ops(log_dir: str, **kwargs) -> None:
    rows = top_ops(log_dir, **kwargs)
    print(f"{'ms':>10} {'share':>6} {'n':>5}  op")
    for r in rows:
        print(f"{r['total_ms']:10.3f} {r['share']:6.1%} {r['count']:5d}  "
              f"{r['name'][:110]}")


if __name__ == "__main__":
    import sys

    print_top_ops(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace")
