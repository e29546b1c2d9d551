"""Scaling-efficiency evidence (BASELINE.json north_rule: throughput
scaling efficiency >= 0.8 between N and 4N executors).

Sandbox protocol (no real cluster): run the IDENTICAL transcript-KG job
(structured extraction -> linking -> per-model aggregation + free-text
entity spotting -> salted counts) on the same deterministic input at two
parallelism levels, identical configs otherwise. Efficiency =
(T_N / T_4N) / 4. Two level modes:

- ``N`` (e.g. ``2,8,32``): thread mode, ``local[N]`` — one JVM, N task
  threads.
- ``ExC`` (e.g. ``1x2,4x2,8x4``): executor mode,
  ``local-cluster[E,C,8192]`` — E SEPARATE executor JVMs with C cores
  each, spawned like a real standalone cluster (own heaps, own GCs, own
  Python workers, loopback shuffle). This is the literal "N vs 4N
  executors" protocol: hold C fixed, quadruple E.

Each level runs in a fresh subprocess (a JVM cannot change its master).

Measurement protocol (r5, per ADVICE r4): the attempt count is
PRE-REGISTERED — every level gets exactly ``--attempts A`` (default 3)
timed trials in one invocation, all recorded; the report shows the MEDIAN
estimate alongside the min, with the full attempt log, and efficiencies
are computed from BOTH estimators. There is no repeat-until-pass mode:
re-running a level replaces its attempts wholesale, never min-merges
across invocations, and the levels cache is keyed by git SHA so attempts
can never mix code versions.

Results checkpoint to BENCH/levels.json per level; the combined report is
written to BENCH/BASELINE.md.

Usage:
  python BENCH/scaling.py <n_conv> <turns> <levels>           # full run
  python BENCH/scaling.py <n_conv> <turns> <levels> --cached  # only
      levels missing from the current git SHA's cache, then report —
      lets long multi-level runs be split across invocations.
  ... [--attempts A]   # pre-registered trials per level (default 3)
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

total_cores = {total_cores}
spark = (SparkSession.builder.appName({app!r})
         .master({master!r})
         .config("spark.sql.shuffle.partitions", str(total_cores * 2))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.autoBroadcastJoinThreshold", "64m")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "16g")
         .config("spark.local.dir", "/dev/shm/spark-local")
         .config("spark.executorEnv.PYTHONPATH", {repo!r})
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(10_000_000).selectExpr("sum(id)").collect()  # warmup

from smh_to_jsonld_spark.plans.pipeline import extract_and_link
from smh_to_jsonld_spark.sources import synth
from smh_to_jsonld_spark.operators import link as linkops

tr = synth.transcripts_at_scale(spark, {n_conv}, {turns},
                                partitions=total_cores * 6).persist()
n_turns = tr.count()  # materialize input outside the timed window

attempts = []
for trial in range({trials}):
    t0 = time.perf_counter()
    core = extract_and_link(spark, tr)
    agg = core["facts"].groupBy("round_id", "model_id").agg(
        *[F.collect_set(c).alias(c) for c in ("location", "target", "output_type")],
        F.max("horizon").alias("max_horizon"),
    )
    agg.write.format("noop").mode("overwrite").save()
    # entity-mention spotting + skew-salted counts (the free-text hot scan)
    ents = core["spotted"].filter(F.col("kind") == "entity").select(
        linkops.normalize_surface(F.col("term")).alias("surface"))
    linkops.salted_count(ents, ["surface"]).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    core["mentions"].unpersist()
    core["conv_wide"].unpersist()
    attempts.append(round(dt, 3))
import statistics
best = min(attempts)
med = statistics.median(attempts)
print(json.dumps({{"level": {level!r}, "total_cores": total_cores,
                   "attempts": attempts,
                   "sec": best, "sec_median": round(med, 3),
                   "turns": n_turns,
                   "turns_per_sec": round(n_turns / best, 1),
                   "turns_per_sec_median": round(n_turns / med, 1)}}))
"""


def parse_level(level: str) -> dict:
    """'8' -> thread mode local[8]; '4x2' -> 4 executors x 2 cores."""
    if "x" in level:
        e, c = (int(v) for v in level.split("x"))
        return {"mode": "executor", "executors": e, "cores_each": c,
                "total_cores": e * c,
                "master": f"local-cluster[{e},{c},8192]"}
    n = int(level)
    return {"mode": "thread", "executors": 1, "cores_each": n,
            "total_cores": n, "master": f"local[{n}]"}


def git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def run_level(level: str, n_conv: int, turns: int, trials: int) -> dict:
    spec = parse_level(level)
    code = RUNNER.format(repo=str(REPO), master=spec["master"],
                         total_cores=spec["total_cores"],
                         app=f"scaling-{level}", level=level,
                         n_conv=n_conv, turns=turns, trials=trials)
    import os

    env = dict(os.environ)
    # executor JVMs import the engine through PYTHONPATH; tmpfs scratch
    # dirs keep virtio disk latency out of the shuffle path
    env["PYTHONPATH"] = str(REPO) + ":" + env.get("PYTHONPATH", "")
    env.setdefault("SMHKG_LOCAL_DIR", "/dev/shm/spark-local")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, env=env,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"runner failed (level={level}):\n{out.stderr[-3000:]}")
    return {**spec, **json.loads(lines[-1])}


LEVELS_CACHE = REPO / "BENCH" / "levels.json"


def _load_cache() -> dict:
    if LEVELS_CACHE.exists():
        return json.loads(LEVELS_CACHE.read_text())
    return {}


def _pairs(levels: list, results: dict, sec_key: str = "sec") -> dict:
    """All N-vs-4N pairs WITHIN a mode: thread pairs quadruple the thread
    count; executor pairs quadruple the executor count at equal
    cores-per-executor (the north_rule protocol)."""
    effs = {}
    for a in levels:
        for b in levels:
            sa, sb = parse_level(a), parse_level(b)
            if sa["mode"] != sb["mode"]:
                continue
            if sa["mode"] == "thread" and sb["total_cores"] != 4 * sa["total_cores"]:
                continue
            if sa["mode"] == "executor" and not (
                sb["executors"] == 4 * sa["executors"]
                and sb["cores_each"] == sa["cores_each"]
            ):
                continue
            effs[f"{a}v{b}"] = round(
                (results[a][sec_key] / results[b][sec_key]) / 4.0, 3
            )
    return effs


def main():
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    levels = (
        sys.argv[3].split(",") if len(sys.argv) > 3
        else ["2", "8", "32", "1x2", "4x2", "2x4", "8x4"]
    )
    use_cache = "--cached" in sys.argv
    attempts_n = 3
    if "--attempts" in sys.argv:
        attempts_n = int(sys.argv[sys.argv.index("--attempts") + 1])

    sha = git_sha()
    cache = _load_cache()
    # cache keyed by (input size, git SHA): attempts can never mix code
    # versions, and a code change automatically invalidates old minima
    key = f"{n_conv}x{turns}@{sha}"
    cache.setdefault(key, {})
    results = {}
    for lv in levels:
        if use_cache and lv in cache[key]:
            results[lv] = cache[key][lv]
            continue
        fresh = run_level(lv, n_conv, turns, trials=attempts_n)
        results[lv] = fresh
        cache[key][lv] = fresh
        LEVELS_CACHE.write_text(json.dumps(cache, indent=1))
        print(json.dumps({"level_done": lv, **results[lv]}), flush=True)
    effs_min = _pairs(levels, results, "sec")
    effs_med = _pairs(levels, results, "sec_median")

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    rows = "\n".join(
        f"| {lv} | {parse_level(lv)['mode']} | {parse_level(lv)['total_cores']} "
        f"| {results[lv]['sec']} | {results[lv].get('sec_median', results[lv]['sec'])} "
        f"| {results[lv]['turns_per_sec']:,} "
        f"| {results[lv].get('attempts', [results[lv]['sec']])} |"
        for lv in levels
    )
    eff_rows = "\n".join(
        f"| {k.replace('v', ' vs ')} | **{effs_min[k]}** | {effs_med.get(k, '—')} |"
        for k in effs_min
    )
    n_turns = results[levels[0]]["turns"]
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Generated {stamp} by `python BENCH/scaling.py {n_conv} {turns} \
{",".join(levels)} --attempts {attempts_n}` at git {sha}.

Job: transcript KG pipeline core (single-pass Catalyst mention extraction
-> broadcast alias linking (exact + blocked fuzzy) -> per-model
distinct-value aggregation + free-text entity spotting -> skew-salted
counts) over {n_turns:,} deterministic synthetic turns
(`sources.synth.transcripts_at_scale`, 60% head-entity skew), identical
input at every level; noop sink.

Measurement protocol (pre-registered, per ADVICE r4): exactly
{attempts_n} timed attempts per level in one invocation, all attempts
logged below; no repeat-until-pass, no cross-invocation min-merging, and
the levels cache is keyed by git SHA so estimates never span code
versions. Min is the primary steady-state estimator under this host's
documented ~2x co-tenancy noise; the median is reported alongside as the
noise-sensitive check.

Two sandbox stand-ins for the "N vs 4N executors" protocol:
- **thread levels** (`local[N]`): one JVM, N task threads;
- **executor levels** (`ExC` -> `local-cluster[E,C,8192]`): E separate
  executor JVMs x C cores — real executor processes with their own heaps,
  GCs and Python workers, the literal multi-executor shape. Executor
  pairs hold C fixed and quadruple E.

| level | mode | total cores | min sec | median sec | turns/sec (min) | attempts |
|---|---|---|---|---|---|---|
{rows}

| pair (N vs 4N) | efficiency (min) | efficiency (median) |
|---|---|---|
{eff_rows}

Target >= 0.8 per BASELINE.json north_rule. ALL N-vs-4N pairs the
measured levels can form are reported. Honest caveat: every executor
shares ONE VM's DRAM; the string/regex kernels saturate the memory bus
around 8-16 cores, so pairs whose larger level exceeds that (4x2 vs 8x4,
thread 8v32) partly measure the memory wall rather than the engine — a
real 4N-executor cluster brings 4N memory buses. The un-saturated pairs
(thread 2v8, executor 1x2-vs-4x2) are the fair stand-ins; the saturated
ones are disclosed alongside rather than hidden.
Executor-shape note (measured round 3, 32 total cores): 8 executors x 4
cores beat 16 x 2 and one 32-thread JVM — per-executor heaps amortize GC
and per-JVM overhead. Historical per-round caches: BENCH/levels_r3.json,
BENCH/levels_r4.json (pre-r5 protocol: best-of-2 with cross-invocation
min-merge — superseded by the pre-registered protocol above).
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.write_text(md)
    print(md)
    print(json.dumps({"git_sha": sha,
                      "results": {k: v for k, v in results.items()},
                      "efficiency_min": effs_min,
                      "efficiency_median": effs_med}))


if __name__ == "__main__":
    main()
