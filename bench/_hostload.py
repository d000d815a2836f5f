"""External host-load measurement for the scaling protocol.

This sandbox is a shared/virtualized box whose background load shifts by
integer factors between hours (BENCH/BASELINE.md methodology). A matched
pair controls for load ACROSS levels but not for a burst INSIDE one
level's timed window — so each trial records how many cores of NON-owned
CPU ran during its window, computed as

    external = (box busy jiffies) - (this process tree's jiffies)

sampled from /proc/stat and a /proc/<pid>/stat tree walk at the window's
start and end. Short-lived external processes are captured (they burn box
jiffies); short-lived OWN processes that die mid-window are undercounted,
which only OVERSTATES external load — the conservative direction for a
gate that discards contended trials. The numbers ride in the trial's raw
JSON; the report's clean-pair rule is declared there.
"""

from __future__ import annotations

import os
import time

__all__ = ["LoadMeter"]


def _box_busy_jiffies() -> int:
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals) - vals[3] - vals[4]  # minus idle + iowait


def _tree_cpu_jiffies(root: int) -> int:
    ppid: dict[int, int] = {}
    cpu: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rp = f.read().rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue
        pid = int(d)
        ppid[pid] = int(rp[1])
        cpu[pid] = int(rp[11]) + int(rp[12])  # utime + stime

    total = 0
    for pid, c in cpu.items():
        p, seen = pid, set()
        while p > 1 and p not in seen:
            if p == root:
                total += c
                break
            seen.add(p)
            p = ppid.get(p, 1)
    return total


class LoadMeter:
    """start() ... stop() -> dict with external/own busy cores averaged
    over the window (box-wide, out of os.cpu_count())."""

    def start(self) -> None:
        self._t = time.time()
        self._busy = _box_busy_jiffies()
        self._own = _tree_cpu_jiffies(os.getpid())

    def stop(self) -> dict:
        wall = max(1e-6, time.time() - self._t)
        hz = os.sysconf("SC_CLK_TCK")
        d_busy = _box_busy_jiffies() - self._busy
        d_own = _tree_cpu_jiffies(os.getpid()) - self._own
        return {
            "wall": round(wall, 2),
            "own_cores": round(d_own / hz / wall, 2),
            "ext_cores": round(max(0, d_busy - d_own) / hz / wall, 2),
        }
