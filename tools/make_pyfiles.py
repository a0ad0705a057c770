"""Build the --py-files archive for spark-submit cluster runs.

Usage: python tools/make_pyfiles.py [out_zip]
Produces dist/healthcare_data_harmonization_dataflow_spark.zip containing the package at the
archive root (importable once Spark adds it to every executor's sys.path).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "healthcare_data_harmonization_dataflow_spark"


def main() -> str:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "dist", f"{PKG}.zip")
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
