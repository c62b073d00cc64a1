"""Structural (host-noise-free) per-entry metrics: number of Spark jobs,
stages and tasks per catalog entry, measured on the SECOND (warm)
execution via job groups. Usage:

    SPARK_GRAFT_CPUS=32 python /tmp/job_counts.py <tree> <entry> [entry...]

Prints one JSON line: {"tree": ..., "entries": {name: {jobs, stages, tasks}}}
"""
import json
import os
import sys

tree = sys.argv[1]
entries = sys.argv[2:]
sys.path.insert(0, tree)
for v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(v, "1")

from syncmaven_spark import get_spark
from syncmaven_spark.queries import CATALOG
from syncmaven_spark.session import load_tables


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(app_name="job_counts")
sc = spark.sparkContext
load_tables(spark, "/root/testdata/sf0.1")["region"].count()

out = {}
for name in entries:
    run = lambda: force(CATALOG[name].spark_fn(spark, "/root/testdata/sf0.1"))
    run()  # warm-up (cold)
    group = f"count_{name}"
    sc.setJobGroup(group, name)
    try:
        run()
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for jid in job_ids:
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                n_stages += 1
                n_tasks += si.numCompletedTasks
    out[name] = {"jobs": len(job_ids), "stages": n_stages, "tasks": n_tasks}
    print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)

print(json.dumps({"tree": tree, "entries": out}))
