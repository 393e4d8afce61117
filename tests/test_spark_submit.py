"""North-rule deployment path: `spark-submit --py-files engine.zip` on a
multi-executor (local-cluster) master, driven for real.

The driver script runs from a scratch cwd where the repo is NOT
importable, so both the driver import and the executor-side Python
workers (which unpickle kernel functions by module reference) must
resolve ``mongoesindexer_spark`` from the shipped zip — exactly what
--py-files provides on a cluster (reference deploys via docker compose,
elastic-search-docker-compose.yml; our analog is the Spark submit path).
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from pyspark.find_spark_home import _find_spark_home

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = '''
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("submit-smoke").getOrCreate()
import mongoesindexer_spark
# prove the package came from the shipped zip, not a filesystem path
assert "engine.zip" in mongoesindexer_spark.__file__, mongoesindexer_spark.__file__
from mongoesindexer_spark.operators.build_index import IndexBuilder
from mongoesindexer_spark.operators.topk import bm25_topk_wand
from mongoesindexer_spark.sources.catalog import ParquetCatalog

pages_path, idx = sys.argv[1], sys.argv[2]
IndexBuilder(idx).build(spark, spark.read.parquet(pages_path))
term = (ParquetCatalog(idx).read(spark, "term_dict")
        .orderBy("df", ascending=False).first()["term"])
hits = bm25_topk_wand(spark, idx, term, 5)
assert len(hits) == 5, len(hits)
print("SUBMIT_OK", len(hits), term)
spark.stop()
'''


@pytest.mark.slow
def test_spark_submit_py_files(tiny_dir, tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "mongoesindexer_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    driver_py = tmp_path / "driver.py"
    driver_py.write_text(DRIVER)
    idx_dir = str(tmp_path / "idx")
    submit = os.path.join(_find_spark_home(), "bin", "spark-submit")
    # cwd is the scratch dir: the repo is off sys.path for the driver AND
    # for executor python workers — only --py-files can satisfy imports
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local-cluster[2,1,2048]",
         "--py-files", zip_path, str(driver_py),
         os.path.join(tiny_dir, "pages.parquet"), idx_dir],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SUBMIT_OK 5" in proc.stdout, proc.stdout[-2000:]
    shutil.rmtree(idx_dir, ignore_errors=True)
