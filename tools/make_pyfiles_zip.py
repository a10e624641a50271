"""Build the ``--py-files`` archive for cluster submission.

The north rule's deployment story is ``spark-submit --py-files plm.zip``
(cli.py docstring); this packages the library exactly as executors need
it — the package directory, source only, no tests/tools/caches — and
prints the archive path plus a ready-to-paste submit line.

    python tools/make_pyfiles_zip.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "parallel_louvain_method_spark"


def build(out: str) -> str:
    root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "plm.zip")
    build(out)
    print(out)
    print(
        f"spark-submit --py-files {out} "
        f"{os.path.join(REPO, PKG, 'cli.py')} <subcommand> ...",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    main()
