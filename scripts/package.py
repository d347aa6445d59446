"""Build the spark-submit artifact: a single zip of the package
(north_rule: `spark-submit --py-files openaleph_search_spark.zip`).
No cluster-side dependencies beyond pyspark/pandas/numpy/pyarrow."""
import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str = None) -> str:
    out = out or os.path.join(ROOT, "dist", "openaleph_search_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "openaleph_search_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else None))
