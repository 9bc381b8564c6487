"""Scaling-efficiency protocol (BASELINE.md): same job, same input, at
local[N] and local[4N]; efficiency = (T_N / T_4N) / 4, target >= 0.8.
Outputs are checksum-compared (determinism under parallelism change) and the
results are written to BENCH/BASELINE.md.

Each parallelism level runs in its own subprocess (own JVM) so the two
measurements share nothing but the input parquet.
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


def run_level(cores: int, input_dir: Path) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            str(HERE / "run_one.py"),
            "--cores",
            str(cores),
            "--input",
            str(input_dir),
            "--repeat",
            os.environ.get("SCALING_REPEAT", "2"),
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
    return json.loads(line)


def main() -> None:
    # one-time VM memory prewarm (see BENCH/prewarm.py): without it, cold
    # guest frames make timings vary 4-10x and unfairly favor the second run
    subprocess.run([sys.executable, str(HERE / "prewarm.py")], check=True)

    suffix = f"_x{TEXT_SCALE}" if TEXT_SCALE != 1 else ""
    input_dir = HERE / "data" / f"pages_{N_DOCS}{suffix}"
    make_input(input_dir, N_DOCS)

    small = run_level(N_SMALL, input_dir)
    big = run_level(N_BIG, input_dir)

    same_output = small["clusters_checksum"] == big["clusters_checksum"]
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

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors.  Sandbox evidence (no real cluster): the same full dedup pipeline
(signatures -> LSH candidates -> features -> decisions -> connected
components) on the identical {N_DOCS}-page synthetic corpus
(text_scale={TEXT_SCALE}, ~{330 * TEXT_SCALE} B of text per page) at
local[{N_SMALL}] vs local[{N_BIG}], one JVM per level.

Per level the pipeline runs twice in the same JVM (BENCH/run_one.py
--repeat): the host continuously reclaims
idle guest frames, so any run can absorb re-fault noise a real executor
pays once per lifetime; the MINIMUM across repeats is the steady state
used for the efficiency ratio (all runs reported).  The VM frame
pool is prewarmed once before both levels (BENCH/prewarm.py).

| parallelism | runs (s) | steady = min (s) | docs/sec (steady) |
|---|---|---|---|
| local[{N_SMALL}] | {small["runs"]} | {small["wall_sec"]} | {small["docs_per_sec"]} |
| local[{N_BIG}] | {big["runs"]} | {big["wall_sec"]} | {big["docs_per_sec"]} |

- **scaling efficiency** = (T_{N_SMALL} / T_{N_BIG}) / {N_BIG // N_SMALL} = **{efficiency:.3f}** (target >= 0.8)
- **deterministic output** under parallelism change: {"YES" if same_output else "NO"}
  (md5 over (count, sum xxhash64(url,gid)): `{small["clusters_checksum"]}`)

Protocol: BENCH/scaling.py (subprocess per level), input snapshot at
BENCH/data/pages_{N_DOCS}{suffix}. Regenerate with `python BENCH/scaling.py`
(SCALING_CORES_N / SCALING_DOCS / SCALING_TEXT_SCALE override the level pair
and corpus).
"""
    (HERE / "BASELINE.md").write_text(md)
    print(f"wrote {HERE / 'BASELINE.md'}")


if __name__ == "__main__":
    main()
