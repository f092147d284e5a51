"""Host-context snapshot for bench/probe artifacts.

Three of eight rounds burned a verdict cycle adjudicating uniform
sub-second timing moves by checkout-and-rerun, each time concluding
"host drift, not engine" (BASELINE.md drift sections; VERDICT r08
Next #5). The artifacts recorded nothing about the machine at
capture time, so the adjudication could not be a table read. This
module fixes that: every bench/probe JSON now embeds
:func:`host_snapshot` output, captured at least at start and end of
the measurement window.

Reads /proc directly (no psutil in the container); every field is
best-effort — a missing /proc entry yields ``None`` rather than an
error, so artifact capture can never fail on an exotic host.
"""

from __future__ import annotations

import os
import time


def _meminfo() -> dict[str, int]:
    out: dict[str, int] = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                k, _, rest = line.partition(":")
                parts = rest.split()
                if parts:
                    out[k] = int(parts[0])  # kB
    except OSError:
        pass
    return out


def _cpu_mhz() -> tuple[float | None, float | None]:
    """(mean, max) of the per-core current frequency — frequency
    scaling / thermal throttling is the usual mechanism behind
    uniform cross-query drift."""
    freqs: list[float] = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("cpu mhz"):
                    freqs.append(float(line.split(":")[1]))
    except (OSError, ValueError):
        pass
    if not freqs:
        return None, None
    return round(sum(freqs) / len(freqs), 1), round(max(freqs), 1)


def host_snapshot() -> dict:
    """One JSON-ready dict of the host signals that matter for
    timing adjudication: load average (other work on the box), CPU
    frequency (scaling/throttling), memory pressure (page-cache
    room — parquet scans are cache-sensitive), and uptime."""
    snap: dict = {"unix_time": round(time.time(), 1)}
    try:
        la1, la5, la15 = os.getloadavg()
        snap["loadavg"] = [round(la1, 2), round(la5, 2), round(la15, 2)]
    except OSError:
        snap["loadavg"] = None
    mean_mhz, max_mhz = _cpu_mhz()
    snap["cpu_mhz_mean"] = mean_mhz
    snap["cpu_mhz_max"] = max_mhz
    mi = _meminfo()
    if mi:
        snap["mem_total_gb"] = round(mi.get("MemTotal", 0) / 1048576, 1)
        snap["mem_available_gb"] = round(
            mi.get("MemAvailable", 0) / 1048576, 1
        )
        snap["page_cache_gb"] = round(mi.get("Cached", 0) / 1048576, 1)
    try:
        with open("/proc/uptime") as f:
            snap["uptime_sec"] = round(float(f.read().split()[0]), 0)
    except (OSError, ValueError):
        snap["uptime_sec"] = None
    return snap
