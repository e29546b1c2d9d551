"""10x-volume soak of the FULL resumable job (VERDICT r4 #3).

The sf0.1 bench exercises 1.2M turns; the design claims 10^12. This soak
runs ``run_resumable_kg_job`` — extraction, linking, entity CC fixpoint,
JSON-LD doc emission, triple flattening, incremental near-dup, node/edge
materialization, snapshot manifest — on a 12M-turn synthetic corpus (10x
the bench volume, 2 round partitions) on local[32], plus a same-session
1.2M-turn reference run of the IDENTICAL job for a like-for-like
throughput ratio. Records, per run:

- wall seconds and turns/s (full job, not just the factory);
- cumulative shuffle **spill** (memory + disk) and shuffle volume from
  the status REST API, diffed per run — the no-spill-pathology check;
- JVM peak RSS (``VmHWM`` of the local-mode JVM) — single reading after
  both runs (the 12M run dominates the high-water mark).

Writes BENCH/soak.md and prints one JSON line. The 10x gate (VERDICT r4
#3): no OOM, no spill pathology, 12M-turn turns/s within 30% of the
1.2M-turn rate measured the same session.

Usage: python BENCH/soak.py [n_conv] [turns] [ref_n_conv]
       (defaults 500_000 x 24 = 12M; reference 50_000 x 24 = 1.2M)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _stage_totals(ui: str) -> dict:
    """Cumulative spill/shuffle across all completed stages of every app
    on this UI (local mode: exactly one app)."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    tot = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0, "inputBytes": 0}
    for app in apps:
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app['id']}/stages")
        )
        for s in stages:
            tot["memoryBytesSpilled"] += s.get("memoryBytesSpilled", 0)
            tot["diskBytesSpilled"] += s.get("diskBytesSpilled", 0)
            tot["shuffleWriteBytes"] += s.get("shuffleWriteBytes", 0)
            tot["inputBytes"] += s.get("inputBytes", 0)
    return tot


def _jvm_peak_rss_gb() -> float | None:
    """VmHWM of the (single, local-mode) SparkSubmit JVM, in GiB."""
    try:
        pids = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True,
        ).stdout.split()
        best = 0
        for pid in pids:
            status = Path(f"/proc/{pid}/status").read_text()
            for line in status.splitlines():
                if line.startswith("VmHWM"):
                    best = max(best, int(line.split()[1]))  # kB
        return round(best / 1024 / 1024, 2) if best else None
    except Exception:
        return None


def run_job(spark, io_dir: str, n_conv: int, turns: int, ui: str) -> dict:
    from smh_to_jsonld_spark.plans.job import run_resumable_kg_job
    from smh_to_jsonld_spark.sources import synth
    from smh_to_jsonld_spark.sources.tables import TableIO

    spec = synth.corpus_spec()
    tr = synth.transcripts_at_scale(spark, n_conv, turns, n_rounds=2)
    before = _stage_totals(ui)
    t0 = time.perf_counter()
    manifest = run_resumable_kg_job(
        spark, tr,
        synth.target_metadata_df(spark, spec),
        synth.diseases_df(spark, spec),
        TableIO(io_dir),
        lineage_note=f"soak:{n_conv}x{turns}",
    )
    wall = time.perf_counter() - t0
    after = _stage_totals(ui)
    delta = {k: after[k] - before[k] for k in after}
    n_turns = n_conv * turns
    return {
        "n_turns": n_turns,
        "wall_sec": round(wall, 1),
        "turns_per_sec": round(n_turns / wall, 1),
        "rounds_committed": sorted(manifest["metrics"]["partitions"]),
        "triples_written": sum(manifest["metrics"]["partitions"].values()),
        "spill_mem_gb": round(delta["memoryBytesSpilled"] / 2**30, 2),
        "spill_disk_gb": round(delta["diskBytesSpilled"] / 2**30, 2),
        "shuffle_write_gb": round(delta["shuffleWriteBytes"] / 2**30, 2),
        "input_gb": round(delta["inputBytes"] / 2**30, 2),
    }


def main():
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    ref_conv = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    os.environ.setdefault("SMHKG_LOCAL_DIR", "/dev/shm/spark-soak-local")
    # heap sizing finding (r5): the engine's 8g default driver heap (fine
    # for the 1.2M-turn bench and CLI) OOMs the single-JVM local mode at
    # 12M turns — the whole cluster's working set (shuffle read-ahead,
    # cache, CC fixpoint) lands in ONE heap here. 64g ~= 2g/core x 32,
    # the per-executor sizing a real cluster would get.
    os.environ.setdefault("SMHKG_DRIVER_MEM", "64g")
    from smh_to_jsonld_spark.session import get_spark

    spark = get_spark(
        app_name="soak", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" \
        if spark.sparkContext.uiWebUrl else "http://localhost:4040"

    base = Path(os.environ.get("SMHKG_SOAK_DIR", "/dev/shm/soak"))
    ref = run_job(spark, str(base / "wh_ref"), ref_conv, turns, ui)
    big = run_job(spark, str(base / "wh_big"), n_conv, turns, ui)
    peak = _jvm_peak_rss_gb()
    ratio = round(big["turns_per_sec"] / ref["turns_per_sec"], 3)

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    md = f"""# Soak: full resumable job at 10x bench volume

Generated by `python BENCH/soak.py {n_conv} {turns} {ref_conv}` on {stamp}
(local[{spark.sparkContext.defaultParallelism}], single JVM; warehouse +
shuffle dirs on tmpfs). Both runs execute the COMPLETE
`run_resumable_kg_job` — extraction, linking, entity CC, doc emission,
triple flatten, incremental near-dup, node/edge tables, manifest — over
2 round partitions of deterministic synthetic transcripts.

| metric | reference ({ref['n_turns']:,} turns) | soak ({big['n_turns']:,} turns) |
|---|---|---|
| wall | {ref['wall_sec']} s | {big['wall_sec']} s |
| full-job turns/s | {ref['turns_per_sec']:,.0f} | {big['turns_per_sec']:,.0f} |
| triples written | {ref['triples_written']:,} | {big['triples_written']:,} |
| shuffle written | {ref['shuffle_write_gb']} GiB | {big['shuffle_write_gb']} GiB |
| spill (memory) | {ref['spill_mem_gb']} GiB | {big['spill_mem_gb']} GiB |
| spill (disk) | {ref['spill_disk_gb']} GiB | {big['spill_disk_gb']} GiB |
| rounds committed | {len(ref['rounds_committed'])} | {len(big['rounds_committed'])} |

JVM peak RSS (VmHWM, both runs): **{peak} GiB** (heap
{os.environ["SMHKG_DRIVER_MEM"]}; the engine's 8g default OOMed this
volume in single-JVM local mode — one heap absorbs the whole cluster's
working set here; a real cluster sizes ~2g/core per executor).

**10x scaling ratio: {ratio}** (soak turns/s / reference turns/s; the
VERDICT r4 #3 gate is >= 0.7, i.e. within 30%). Spill pathology check:
disk spill {big['spill_disk_gb']} GiB against
{big['shuffle_write_gb']} GiB of legitimate shuffle volume.
"""
    (REPO / "BENCH" / "soak.md").write_text(md)
    print(json.dumps({"ref": ref, "soak": big, "ratio": ratio,
                      "jvm_peak_rss_gb": peak}))


if __name__ == "__main__":
    main()
