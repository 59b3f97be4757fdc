"""The north rule's deploy surface, exercised for real: build the
``--py-files`` zip with scripts/package.py, then run an actual
``spark-submit --master local[4]`` whose job imports the package FROM THE
ZIP (cwd is a temp dir, PYTHONPATH is scrubbed — the repo checkout is not
importable) and validates a small parquet table through the CLI."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_package_zip_is_deterministic_and_complete(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package as pkg

    a = pkg.build_zip_bytes()
    b = pkg.build_zip_bytes()
    assert a == b  # content-addressed artifact: same sources, same bytes

    path = pkg.build(str(tmp_path))
    assert os.path.basename(path).startswith("slower_whisper_spark-")
    import zipfile

    with zipfile.ZipFile(path) as z:
        names = z.namelist()
    assert "slower_whisper_spark/__init__.py" in names
    assert "slower_whisper_spark/cli.py" in names
    assert not any("__pycache__" in n or n.startswith("tests/") for n in names)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed")
def test_spark_submit_py_files_end_to_end(tmp_path, spark):
    """Real spark-submit: the zip is the ONLY import source for the package."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package as pkg

    zip_path = pkg.build(str(tmp_path / "dist"))

    # small partitioned table + suite spec, written with the session fixture
    from pyspark.sql import functions as F

    from slower_whisper_spark.datagen import generate_docs

    docs, _, _ = generate_docs(300, seed=7)
    table = str(tmp_path / "docs")
    spark.createDataFrame(docs).withColumn("warc_day", F.to_date("warc_ts")).write.mode(
        "overwrite"
    ).partitionBy("warc_day").parquet(table)
    suite = {
        "name": "submit-smoke",
        "version": 1,
        "rules": [{"type": "not_null", "column": "url", "rule_id": "r1"}],
    }
    spec = tmp_path / "suite.json"
    spec.write_text(json.dumps(suite))

    # isolate: job script copied to the temp cwd, PYTHONPATH scrubbed of the
    # repo — the package can only come from --py-files
    job = tmp_path / "submit_job.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "submit_job.py"), job)
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            str(job),
            "validate",
            table,
            "--suite",
            str(spec),
            "--manifest",
            str(tmp_path / "manifest"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 300
    assert summary["overall_passed"] is True
    assert summary["processed"] > 0


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed")
def test_spark_submit_master_is_honored(tmp_path):
    """get_spark must NOT override the submit line's --master with local[*]
    (regression: a pre-session SparkConf() is an empty dict, so conf-based
    detection silently failed and every cluster submit became single-node)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package as pkg

    zip_path = pkg.build(str(tmp_path / "dist"))
    probe = tmp_path / "probe.py"
    probe.write_text(
        "from slower_whisper_spark.session import get_spark\n"
        "print('MASTER=' + get_spark(app_name='probe').sparkContext.master)\n"
    )
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    env["SPARK_GRAFT_DRIVER_MEM"] = "1g"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[3]", "--py-files", zip_path, str(probe)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MASTER=local[3]" in proc.stdout, proc.stdout[-500:]
