"""Aggregate a Spark event log: per-stage wall vs executor time, shuffle
bytes, and the gaps BETWEEN stages (driver/scheduling time no task covers).

Usage: python scripts/analyze_eventlog.py /tmp/spark-events/<app-id> [top_n]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _lines(path):
    """Yield event-log lines from a plain file OR a rolling eventlog_v2
    directory.  .zstd parts (written when spark.eventLog.compress is on) are
    decompressed with Spark's own bundled zstd-jni via a throwaway local[1]
    JVM — no zstd CLI or python binding exists in this container."""
    import os

    if not os.path.isdir(path):
        with open(path) as f:
            yield from (ln.rstrip("\n") for ln in f)
        return
    parts = sorted(
        (f for f in os.listdir(path) if f.startswith("events_")),
        key=lambda f: int(f.split("_")[1]),
    )
    plain = [p for p in parts if not p.endswith(".zstd")]
    if plain == parts:
        for p in parts:
            with open(os.path.join(path, p)) as f:
                yield from (ln.rstrip("\n") for ln in f)
        return
    from webdedup.session import get_spark

    spark = get_spark(app_name="zstd-decode", cores=1)
    jvm = spark._jvm
    for p in parts:
        src = os.path.join(path, p)
        if p.endswith(".zstd"):
            dst = f"/tmp/evlog_{p}.json"
            fis = jvm.java.io.FileInputStream(src)
            zis = jvm.com.github.luben.zstd.ZstdInputStream(fis)
            fos = jvm.java.io.FileOutputStream(dst)
            jvm.org.apache.commons.io.IOUtils.copyLarge(zis, fos)
            zis.close()
            fos.close()
            src = dst
        with open(src) as f:
            yield from (ln.rstrip("\n") for ln in f)


def _empty_stage() -> dict:
    return {
        "name": "?",
        "tasks": 0,
        "submit": None,
        "complete": None,
        "wall_s": 0.0,
        "run_s": 0.0,
        "cpu_s": 0.0,
        "gc_s": 0.0,
        "shuf_r": 0,
        "shuf_w": 0,
        "spill": 0,
    }


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    stages = {}  # (stage_id, attempt) -> dict
    app_start = app_end = None
    if True:
        for line in _lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                st = stages.setdefault(key, _empty_stage())
                st.update(
                    name=si["Stage Name"].split("\n")[0][:60],
                    tasks=si["Number of Tasks"],
                    submit=sub,
                    complete=comp,
                    wall_s=(comp - sub) / 1000.0 if sub and comp else 0.0,
                )
            elif e == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(key, _empty_stage())
                st["run_s"] += m.get("Executor Run Time", 0) / 1000.0
                st["gc_s"] += m.get("JVM GC Time", 0) / 1000.0
                st["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                st["shuf_r"] += (m.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                st["shuf_w"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                st["spill"] += m.get("Disk Bytes Spilled", 0)

    done = [s for s in stages.values() if s["submit"]]
    done.sort(key=lambda s: s["submit"])
    total_wall = (app_end - app_start) / 1000.0 if app_start and app_end else 0.0
    covered = 0.0
    last_end = None
    gap = 0.0
    for s in done:
        if last_end is not None and s["submit"] > last_end:
            gap += (s["submit"] - last_end) / 1000.0
        last_end = max(last_end or 0, s["complete"])
        covered += s["wall_s"]

    tot_run = sum(s["run_s"] for s in done)
    tot_cpu = sum(s["cpu_s"] for s in done)
    tot_gc = sum(s["gc_s"] for s in done)
    tot_sw = sum(s["shuf_w"] for s in done)
    tot_sr = sum(s["shuf_r"] for s in done)
    tot_spill = sum(s["spill"] for s in done)
    print(
        f"app_wall={total_wall:.1f}s stages={len(done)} "
        f"sum_stage_wall={covered:.1f}s inter-stage gap~{gap:.1f}s\n"
        f"executor_run={tot_run:.1f}s cpu={tot_cpu:.1f}s gc={tot_gc:.1f}s "
        f"shuffle_write={tot_sw / 1e9:.2f}GB read={tot_sr / 1e9:.2f}GB "
        f"spill={tot_spill / 1e9:.2f}GB"
    )
    done.sort(key=lambda s: s["wall_s"], reverse=True)
    print(f"\ntop {top_n} stages by wall:")
    print("  wall_s  run_s   cpu_s   gc_s  tasks shufW_MB shufR_MB name")
    for s in done[:top_n]:
        print(
            f"  {s['wall_s']:6.1f} {s['run_s']:6.1f} {s['cpu_s']:7.1f} "
            f"{s['gc_s']:6.1f} {s['tasks']:5d} {s['shuf_w'] / 1e6:8.1f} "
            f"{s['shuf_r'] / 1e6:8.1f} {s['name']}"
        )


if __name__ == "__main__":
    main()
