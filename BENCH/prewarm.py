"""One-time VM memory prewarm for stable benchmarking.

MEASURED SANDBOX PATHOLOGY (see webdedup/session.py): guest-physical frames
that have never been touched since VM boot fault in at ~6-50 us/page
(sometimes ~1 ms/page under scattered access), while previously-used frames
are normal speed.  Any fresh JVM/worker allocation that lands on cold frames
stalls, which made per-stage timings vary 4-10x run to run.

This script touches `PREWARM_GB` (default: free memory minus 8 GB headroom)
of anonymous memory once, sequentially, in 1 GB chunks, then frees it —
leaving the frames warm for every subsequent process.  Run once per VM boot
before benchmarking; re-running on a warm VM exits quickly (rate check).
"""

from __future__ import annotations

import os
import time

CHUNK = 1 << 30  # 1 GB


def free_gb() -> float:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemAvailable"):
                return int(line.split()[1]) / (1 << 20)
    return 0.0


def main() -> None:
    target_gb = int(os.environ.get("PREWARM_GB", "0")) or max(int(free_gb()) - 8, 1)
    print(f"prewarming {target_gb} GB (available {free_gb():.0f} GB)", flush=True)
    total_t0 = time.time()
    for i in range(target_gb):
        t0 = time.time()
        buf = bytearray(CHUNK)  # zero-page backed
        # touch every 4 KiB page to force a frame allocation
        for off in range(0, CHUNK, 4096):
            buf[off] = 1
        dt = time.time() - t0
        del buf
        print(f"  chunk {i + 1}/{target_gb}: {dt:.2f}s", flush=True)
    print(f"done in {time.time() - total_t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
