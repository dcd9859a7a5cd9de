"""Per-job profile of the scaling-bench compute leg at one parallelism.

Usage: python /tmp/profile_compute.py <cpus> <docs>
Prints one line per Spark job: duration, task count, description.
"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from cpg_spark.session import build_session
from cpg_spark.synth import generated_docs
from cpg_spark.operators.parse import parse_docs, split_parse_output
from cpg_spark.operators.link import link_all

cpus = int(sys.argv[1])
docs_n = int(sys.argv[2])
spark = build_session(cpus=cpus, extra_conf={"spark.ui.enabled": "true"})
docs = generated_docs(spark, docs_n).persist()
docs.count()


def compute_job():
    raw = parse_docs(docs).persist()
    try:
        nodes, edges, mentions, symbols = split_parse_output(raw)
        linked, inferred, _ = link_all(mentions, symbols)
        return edges.select("subj", "pred", "obj").unionByName(
            linked.select("subj", "pred", "obj")).groupBy("pred").count().count()
    finally:
        raw.unpersist()


compute_job()  # warmup
sc = spark.sparkContext
start_job = sc.statusTracker().getJobIdsForGroup(None)
t0 = time.time()
compute_job()
wall = time.time() - t0

ui = sc.uiWebUrl
app = sc.applicationId
jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))


def ts(s):
    return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")) + float("0." + s.split(".")[1].rstrip("GMT"))


rows = []
for j in sorted(jobs, key=lambda j: j["jobId"]):
    dur = ts(j["completionTime"]) - ts(j["submissionTime"])
    rows.append((j["jobId"], dur, j["numTasks"], j.get("description") or j["name"][:110]))

# keep only the timed (second) run: jobs submitted within the timed window
print(f"CPUS={cpus} docs={docs_n} timed_wall={wall:.1f}s  (all jobs below incl. warmup)")
for jid, dur, nt, name in rows:
    print(f"job {jid:3d}  {dur:7.2f}s  tasks={nt:4d}  {name[:120]}")
spark.stop()
