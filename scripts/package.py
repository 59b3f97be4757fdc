"""Build the ``--py-files`` artifact for cluster deploys.

The north-rule deploy surface is ``spark-submit --py-files`` on a
multi-executor cluster: the driver and every executor import
``slower_whisper_spark`` from one content-addressed zip, so a run is pinned
to exactly the code that built its checkpoint manifests (the same
reproducibility contract as the suite lockfile). Mirrors the reference's
console-script packaging (ref: pyproject.toml:60-70) re-expressed for
Spark's artifact distribution model.

Usage:
    python scripts/package.py [--out DIST_DIR]

    spark-submit --master spark://HOST:7077 \\
        --py-files dist/slower_whisper_spark-<version>-<hash12>.zip \\
        scripts/submit_job.py validate s3://bucket/table \\
        --suite suites/webtext.json --manifest s3://bucket/manifests/webtext

The zip embeds only the package's ``.py`` sources (no tests, no caches),
zipped with fixed timestamps so the same sources always produce the same
bytes — the sha256 in the filename IS the deploy identity.
"""

from __future__ import annotations

import argparse
import hashlib
import io
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "slower_whisper_spark"


def build_zip_bytes(repo_root: str = REPO) -> bytes:
    """Deterministic zip of the package sources (sorted names, fixed
    mtimes): byte-identical for identical sources, so the artifact hash is
    a content address."""
    buf = io.BytesIO()
    pkg_root = os.path.join(repo_root, PKG)
    names = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                names.append((os.path.relpath(full, repo_root), full))
    names.sort()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in names:
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    return buf.getvalue()


def build(out_dir: str) -> str:
    """Write the artifact; returns its path."""
    sys.path.insert(0, REPO)
    from slower_whisper_spark import __version__

    data = build_zip_bytes()
    digest = hashlib.sha256(data).hexdigest()[:12]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{PKG}-{__version__}-{digest}.zip")
    with open(path, "wb") as f:
        f.write(data)
    return path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default=os.path.join(REPO, "dist"))
    args = p.parse_args(argv)
    path = build(args.out)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
