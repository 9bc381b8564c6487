"""Scaling-efficiency protocol (BASELINE.md): same job, same input, at
local[N] and local[4N]; efficiency = (T_N / T_4N) / 4, target >= 0.8.
Outputs are checksum-compared (determinism under parallelism change) and the
results are written to BENCH/BASELINE.md.

Every sample runs in its own subprocess (own JVM) and samples are
interleaved across the two levels (small, big, small, big, ...) so both
levels sample the same host-noise regime; per-level steady state is the
minimum across samples.  SCALING_SAMPLES (default 3) controls samples per
level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = Path(__file__).parent
N_DOCS = int(os.environ.get("SCALING_DOCS", "400000"))
TEXT_SCALE = int(os.environ.get("SCALING_TEXT_SCALE", "4"))
N_SMALL = int(os.environ.get("SCALING_CORES_N", "8"))
N_BIG = 4 * N_SMALL


def make_input(path: Path, n_docs: int) -> None:
    """Generate the synthetic corpus once and snapshot it as parquet.

    Bench corpus defaults: 400k pages at text_scale=4 (~1.3 KB of text per
    page, Common-Crawl-sized) — big enough that parallel work dominates the
    engine's fixed stage-scheduling cost at local[32] (a 60k-snippet corpus
    finishes in under a minute warm, which measures the scheduler, not the
    engine)."""
    from webdedup.session import get_spark
    from webdedup.synth import generate_pages, generate_pages_spark, pages_to_spark

    if (path / "_SUCCESS").exists():
        return
    spark = get_spark(app_name="scaling-datagen", cores=N_BIG)
    if n_docs <= 100_000 and TEXT_SCALE == 1:
        pages_pd, _, _ = generate_pages(n_docs=n_docs, seed=42)
        df = pages_to_spark(spark, pages_pd, partitions=64)
    else:
        df = generate_pages_spark(
            spark, n_docs=n_docs, seed=42, partitions=64, text_scale=TEXT_SCALE
        )
    df.write.mode("overwrite").parquet(str(path))
    spark.stop()


def run_sample(cores: int, input_dir: Path, sample_ix: int) -> dict:
    """One pipeline run in its own JVM (repeat=1): interleaving samples
    across levels (small, big, small, big, ...) keeps both levels inside the
    same host-noise regime — the sandbox VM's frame pool and host load drift
    on ~10-minute scales, which back-to-back per-level blocks alias into the
    efficiency ratio."""
    out = subprocess.run(
        [
            sys.executable,
            str(HERE / "run_one.py"),
            "--cores",
            str(cores),
            "--input",
            str(input_dir),
            "--repeat",
            "1",
        ],
        capture_output=True,
        text=True,
    )
    errfile = HERE / f"run_one_{cores}.stderr"
    errfile.write_text(out.stderr)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(
            f"run_one --cores {cores} failed rc={out.returncode} (full stderr: {errfile})"
        )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    print(
        f"sample {sample_ix}: local[{cores}] -> {res['wall_sec']}s",
        file=sys.stderr,
        flush=True,
    )
    return res


def summarize(samples: list[dict]) -> dict:
    """Min across interleaved samples = steady state (host reclaims idle
    guest frames continuously; any one run can absorb re-fault noise a real
    executor pays once per lifetime)."""
    runs = [s["wall_sec"] for s in samples]
    wall = min(runs)
    return {
        "cores": samples[0]["cores"],
        "n_docs": samples[0]["n_docs"],
        "runs": runs,
        "wall_sec": wall,
        "docs_per_sec": round(samples[0]["n_docs"] / wall, 1),
        "clusters_checksum": samples[0]["clusters_checksum"],
        "all_checksums_equal": len({s["clusters_checksum"] for s in samples}) == 1,
    }


def main() -> None:
    # one-time VM memory prewarm (see BENCH/prewarm.py): without it, cold
    # guest frames make timings vary 4-10x and unfairly favor the second run
    subprocess.run([sys.executable, str(HERE / "prewarm.py")], check=True)

    suffix = f"_x{TEXT_SCALE}" if TEXT_SCALE != 1 else ""
    input_dir = HERE / "data" / f"pages_{N_DOCS}{suffix}"
    make_input(input_dir, N_DOCS)

    n_samples = int(os.environ.get("SCALING_SAMPLES", "3"))
    small_samples: list[dict] = []
    big_samples: list[dict] = []
    for i in range(n_samples):
        small_samples.append(run_sample(N_SMALL, input_dir, 2 * i))
        big_samples.append(run_sample(N_BIG, input_dir, 2 * i + 1))
    small = summarize(small_samples)
    big = summarize(big_samples)

    same_output = (
        small["clusters_checksum"] == big["clusters_checksum"]
        and small["all_checksums_equal"]
        and big["all_checksums_equal"]
    )
    efficiency = (small["wall_sec"] / big["wall_sec"]) / (N_BIG / N_SMALL)

    result = {
        "n_docs": N_DOCS,
        f"local[{N_SMALL}]": small,
        f"local[{N_BIG}]": big,
        "deterministic_output": same_output,
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": bool(same_output and efficiency >= 0.8),
    }
    print(json.dumps(result, indent=2))
    # machine-readable result next to the curated narrative: BASELINE.md is
    # hand-maintained (round-over-round tables, membw ceiling, 8->32
    # cross-check) and must not be clobbered by a rerun
    (HERE / f"scaling_{N_SMALL}_{N_BIG}_{N_DOCS}.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )

    md = f"""# scaling run summary (auto-generated; curated copy: BASELINE.md)

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors.  Sandbox evidence (no real cluster): the same full dedup pipeline
(signatures -> LSH candidates -> features -> decisions -> connected
components) on the identical {N_DOCS}-page synthetic corpus
(text_scale={TEXT_SCALE}, ~{330 * TEXT_SCALE} B of text per page) at
local[{N_SMALL}] vs local[{N_BIG}], one JVM per level.

Samples are INTERLEAVED across levels ({N_SMALL},{N_BIG} alternating,
{len(small["runs"])} samples per level, one JVM per run) so both levels see
the same host-noise regime; the host continuously reclaims idle guest
frames, so any run can absorb re-fault noise a real executor pays once per
lifetime — the MINIMUM across samples is the steady state used for the
efficiency ratio (all runs reported).  The VM frame pool is prewarmed once
up front (BENCH/prewarm.py).

| parallelism | runs (s) | steady = min (s) | docs/sec (steady) |
|---|---|---|---|
| local[{N_SMALL}] | {small["runs"]} | {small["wall_sec"]} | {small["docs_per_sec"]} |
| local[{N_BIG}] | {big["runs"]} | {big["wall_sec"]} | {big["docs_per_sec"]} |

- **scaling efficiency** = (T_{N_SMALL} / T_{N_BIG}) / {N_BIG // N_SMALL} = **{efficiency:.3f}** (target >= 0.8)
- **deterministic output** under parallelism change: {"YES" if same_output else "NO"}
  (md5 over (count, sum xxhash64(url,gid)): `{small["clusters_checksum"]}`)

Protocol: BENCH/scaling.py (interleaved samples, subprocess per run),
input snapshot at
BENCH/data/pages_{N_DOCS}{suffix}. Regenerate with `python BENCH/scaling.py`
(SCALING_CORES_N / SCALING_DOCS / SCALING_TEXT_SCALE override the level pair
and corpus).
"""
    (HERE / "last_scaling_run.md").write_text(md)
    print(f"wrote {HERE / 'last_scaling_run.md'}")


if __name__ == "__main__":
    main()
