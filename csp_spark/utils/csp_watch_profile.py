"""csp_watch_profile parity (reference csp/utils/csp_watch_profile.py:
1-63): watch a LIVE engine's profile by polling its HTTP endpoint and
printing per-interval diffs.

The reference polls the csp engine's embedded profiling HTTP server;
the Spark engine already ships that server — the Spark UI REST API
(``/api/v1/applications/<app>/jobs|stages|executors``) — so this
watcher polls it and prints the interval's job/stage/task deltas.
Usage (same flag shape as the reference)::

    python -m csp_spark.utils.csp_watch_profile --host localhost \
        --port 4040 [--interval 5] [--include_mem]

``--include_mem`` adds executor memory deltas (the reference's
``snap_memory`` analog).
"""

from __future__ import annotations

import argparse
import json
import time
import urllib.request
from datetime import datetime
from typing import Any


def fetch(url: str) -> Any:
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def snapshot(base: str) -> dict:
    """One profile snapshot: aggregate job/stage counters + per-stage
    rows keyed like the reference's per-node stats."""
    apps = fetch(f"{base}/api/v1/applications")
    app_id = apps[0]["id"]
    stages = fetch(f"{base}/api/v1/applications/{app_id}/stages")
    jobs = fetch(f"{base}/api/v1/applications/{app_id}/jobs")
    per_stage = {
        f"{s['name'].splitlines()[0][:40]}#{s['stageId']}": (
            s.get("numCompleteTasks", 0),
            round(s.get("executorRunTime", 0) / 1000.0, 3),
        )
        for s in stages
    }
    return {
        "jobs": len(jobs),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "stage_stats": per_stage,
        "app_id": app_id,
    }


def snapshot_memory(base: str, app_id: str) -> dict:
    execs = fetch(f"{base}/api/v1/applications/{app_id}/executors")
    return {
        e["id"]: (e.get("rddBlocks", 0), e.get("memoryUsed", 0))
        for e in execs
    }


def diff_stats(new: dict, old: dict) -> dict:
    """Per-stage (tasks, runtime-s) deltas — the reference's
    ProfilerInfo.__sub__ shape."""
    out = {}
    for k, (nt, nr) in new["stage_stats"].items():
        ot, orr = old["stage_stats"].get(k, (0, 0.0))
        if nt - ot or round(nr - orr, 3):
            out[k] = (nt - ot, round(nr - orr, 3))
    return out


def diff_mem(new_meminfo: dict, old_meminfo: dict) -> dict:
    """Executor memory deltas (reference diff_mem, same signature)."""
    res = {}
    for obj, (new_count, new_mem) in new_meminfo.items():
        old_count, old_mem = (old_meminfo or {}).get(obj, (0, 0))
        if new_count - old_count or new_mem - old_mem:
            res[obj] = (new_count - old_count, new_mem - old_mem)
    return res


def print_stats(d: dict, mem: dict | None = None) -> None:
    print("=" * 80)
    print(datetime.now().isoformat(), ":")
    print("%-44s %-10s %-10s" % ("STAGE", "TASKS", "RUNTIME_S"))
    for k, (t, r) in sorted(d.items(), key=lambda kv: -kv[1][1]):
        print("%-44s %-10s %-10s" % (k, t, r))
    if mem:
        print("Memory diffs:")
        print("%-20s %-10s %-10s" % ("EXECUTOR", "BLOCKS", "BYTES"))
        for obj, (count, m) in mem.items():
            print("%-20s %-10s %-10s" % (obj, count, m))


def watch(base: str, interval: float, include_mem: bool,
          max_polls: int | None = None) -> None:
    last = last_mem = None
    polls = 0
    while max_polls is None or polls < max_polls:
        snap = snapshot(base)
        mem = snapshot_memory(base, snap["app_id"]) if include_mem else None
        if last is not None:
            print_stats(
                diff_stats(snap, last),
                diff_mem(mem, last_mem) if include_mem else None,
            )
        last, last_mem = snap, mem
        polls += 1
        if max_polls is None or polls < max_polls:
            time.sleep(interval)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--host", required=True)
    p.add_argument("--port", required=True)
    p.add_argument("--interval", default="5", help="interval in seconds")
    p.add_argument("--include_mem", action="store_true")
    a = p.parse_args()
    watch(f"http://{a.host}:{a.port}", float(a.interval), a.include_mem)


if __name__ == "__main__":
    main()
