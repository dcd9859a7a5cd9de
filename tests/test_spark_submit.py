"""Deployment-shape integration test (north_rule: "run via spark-submit
--py-files on multi-executor clusters"): package cpg_spark/ into a zip,
launch the REAL spark-submit with --py-files from a cwd outside the
repo and a scrubbed PYTHONPATH, and assert the full checkpointed
pipeline completes and resumes.  This is the only test that exercises
zipimport on the Arrow-UDF executors — a data-file access or implicit
repo-relative import inside the package would fail here and nowhere
else."""

from __future__ import annotations

import os
import re
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary")


def _make_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "cpg_spark.zip")
    pkg = os.path.join(REPO, "cpg_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath, workdir, input_uri, run_id, cwd):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}  # the zip must be self-sufficient
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--driver-memory", "4g",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "cpg_job.py"),
        "--input", input_uri, "--workdir", workdir, "--run-id", run_id,
    ]
    return subprocess.run(cmd, capture_output=True, text=True, cwd=cwd,
                          timeout=900, env=env)


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from cpg_spark.synth import fixture_docs

    input_uri = str(tmp_path / "docs")
    fixture_docs(spark, langs=("python", "go")).write.parquet(input_uri)
    zpath = _make_zip(str(tmp_path))
    workdir = str(tmp_path / "wd")

    out = _submit(zpath, workdir, input_uri, "submit1", cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-3000:]
    m = re.search(r"CPG_JOB_DONE run_id=submit1 edges=(\S+) triples=(\d+)",
                  out.stdout)
    assert m, out.stdout[-3000:]
    n1 = int(m.group(2))
    assert n1 > 100

    # resume: the same run_id must reuse every committed stage and report
    # identical triple counts (north_rule "resumable from checkpoint")
    out2 = _submit(zpath, workdir, input_uri, "submit1", cwd=str(tmp_path))
    assert out2.returncode == 0, out2.stderr[-3000:]
    m2 = re.search(r"CPG_JOB_DONE run_id=submit1 edges=\S+ triples=(\d+)",
                   out2.stdout)
    assert m2 and int(m2.group(1)) == n1
