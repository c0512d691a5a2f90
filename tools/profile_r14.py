"""Round-14 optimization profiler (guide §1): run named queries with the
noop sink under an event-logged session, then parse the event log into a
per-query job/stage breakdown — job count, wall time per job, task time,
shuffle bytes — so the expensive step inside each multi-job composition
is identified empirically instead of guessed.

    python tools/profile_r14.py sf_dir name [name ...]

Each query runs twice: cold (first call) and warm; both are labelled via
setJobDescription so the event log attributes every job to its query and
iteration. Output: per-query summary + top jobs by wall time.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.plans import QUERIES  # noqa: E402
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-r14"


def run(sf_dir: str, names: "list[str]") -> None:
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "profile_r14",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    walls: dict[str, float] = {}
    for name in names:
        for it in ("cold", "warm"):
            sc.setJobDescription(f"{name}|{it}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls[f"{name}|{it}"] = time.perf_counter() - t0
        sc.setJobDescription(None)
    spark.stop()

    # parse the event log: jobs keyed by spark.job.description
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    logs = []
    for dirpath, _dirs, files in os.walk(EVDIR):
        logs.extend(
            os.path.join(dirpath, f)
            for f in files
            if f.startswith("events_") or f.startswith("local-")
        )
    for path in logs:
        for line in open(path, errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not isinstance(ev, dict):
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif t == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                    "ms": si.get("Completion Time", 0)
                    - si.get("Submission Time", si.get("Completion Time", 0)),
                }

    by_q: dict[str, list] = {}
    for jid, j in sorted(jobs.items()):
        if "t1" not in j:
            continue
        by_q.setdefault(j["desc"], []).append(
            (jid, (j["t1"] - j["t0"]) / 1000.0, j["stages"])
        )
    for q in sorted(by_q):
        js = by_q[q]
        tot = sum(w for _, w, _ in js)
        print(
            f"\n== {q}: wall {walls.get(q, 0):.2f}s, {len(js)} jobs, "
            f"job-time sum {tot:.2f}s"
        )
        for jid, w, stg in sorted(js, key=lambda x: -x[1])[:12]:
            names_ = "; ".join(
                f"{stages[s]['name'].splitlines()[0][:60]}"
                f"[{stages[s]['tasks']}t]"
                for s in stg
                if s in stages
            )
            print(f"   job {jid}: {w * 1000:7.0f} ms  {names_[:150]}")


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2:])
