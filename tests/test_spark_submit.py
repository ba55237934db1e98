"""North-rule launch mode: the engine actually ships as `spark-submit
--py-files dataverifyr_spark.zip jobs/validate_job.py` — exercised here with
a REAL spark-submit subprocess (not an importlib shortcut), including the
kill-free resume contract: a second submit with the same --run-id reports
zero pending partitions."""

import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
class TestSparkSubmitLaunch:
    def test_validate_job_via_py_files_and_resume(self, tmp_path):
        # package the library the way a cluster submit would
        zip_path = tmp_path / "dataverifyr_spark.zip"
        pkg = os.path.join(REPO, "dataverifyr_spark")
        with zipfile.ZipFile(zip_path, "w") as z:
            for root, _dirs, files in os.walk(pkg):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO))

        from dataverifyr_spark import rule, ruleset, write_rules

        rules_yaml = tmp_path / "rules.yaml"
        write_rules(
            ruleset(
                rule("l_quantity > 0", name="qty_pos"),
                rule("l_quantity <= 30", name="qty_cap"),
            ),
            str(rules_yaml),
        )
        out = tmp_path / "out"

        def submit():
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)  # the zip must be the ONLY library source
            return subprocess.run(
                [
                    SPARK_SUBMIT,
                    "--master", "local[4]",
                    "--conf", "spark.ui.enabled=false",
                    "--conf", "spark.sql.shuffle.partitions=4",
                    "--py-files", str(zip_path),
                    os.path.join(REPO, "jobs", "validate_job.py"),
                    "--input", "/root/testdata/sf0.001/lineitem.parquet",
                    "--rules", str(rules_yaml),
                    "--out", str(out),
                    "--part-col", "l_returnflag",
                    "--run-id", "submit-test",
                    "--by-file",
                ],
                capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
            )

        r1 = submit()
        assert r1.returncode == 0, r1.stderr[-2000:]
        assert "run_id=submit-test" in r1.stdout, r1.stdout[-2000:]
        assert "validated 3 pending partition(s)" in r1.stdout, r1.stdout[-1500:]
        # summary + tagged violations landed as parquet
        assert any(f.endswith(".parquet") for _r, _d, fs in os.walk(out / "summary") for f in fs)
        assert any(f.endswith(".parquet") for _r, _d, fs in os.walk(out / "violations") for f in fs)
        # per-source-file summary (--by-file): single input file x 2 rules,
        # every row carrying the full file URI and the whole table's count
        import duckdb

        by_file = duckdb.sql(
            f"SELECT file, name, tests FROM '{out}/summary_by_file/*.parquet'"
        ).fetchall()
        assert len(by_file) == 2 and {r[1] for r in by_file} == {"qty_pos", "qty_cap"}
        assert all(r[0].endswith("lineitem.parquet") and r[2] == 6000 for r in by_file)

        # resume: same run-id → ledger reports nothing pending
        r2 = submit()
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "validated 0 pending partition(s)" in r2.stdout, r2.stdout[-1500:]
        assert "resume: all partitions already committed" in r2.stdout
