"""Time a subset of catalog entries at the synthetic sf1 tier (10x sf0.1)
with the bench's own methodology (noop sink, min-of-2 warm + a third
sample on >2x disagreement). Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
like bench.py. Prints one JSON line {"cpus": N, "queries": {...}}.
"""
import json
import os
import sys
import time

for _var in (
    "OPENBLAS_NUM_THREADS",
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
):
    os.environ.setdefault(_var, "1")

sys.path.insert(0, "/root/repo")

ENTRIES = [
    # knn family
    "knn_cosine_bruteforce",
    "knn_cosine_ivf",
    "knn_ivf_index_probe",
    "knn_pq_probe",
    "knn_ivfpq_rerank",
    "knn_ivfpq_residual",
    "knn_recon_drift_assigned",
    "knn_streaming_ingest",
    # dedup / decontamination family
    "dedup_minhash_candidates",
    "dedup_simhash_pairs",
    "dedup_minhash_incremental",
    "dedup_simhash_incremental",
    "dedup_cosine_incremental",
    "decontamination_fuzzy",
    "decontamination_containment",
    # compute-scaling text entries
    "text_verbatim_dup",
    "text_verbatim_spans",
    "graph_connected_components",
]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _warm_min(fn):
    warm = [_timed(fn), _timed(fn)]
    if max(warm) > 2 * min(warm):
        warm.append(_timed(fn))
    return round(min(warm), 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1data")
    from syncmaven_spark import get_spark
    from syncmaven_spark.queries import CATALOG
    from syncmaven_spark.session import load_tables

    spark = get_spark(app_name="sf1_scaling")
    tables = load_tables(spark, sf_dir)
    tables["region"].count()

    out = {}
    for name in ENTRIES:
        spark.sparkContext.setJobDescription(f"sf1: {name}")
        run = lambda: _force(CATALOG[name].spark_fn(spark, sf_dir))  # noqa: E731
        _timed(run)  # cold
        out[name] = _warm_min(run)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", 0)),
        "sf_dir": sf_dir,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
