"""The committed spark-submit artifact must match the source tree.

The north rule ships the engine as ``spark-submit --py-files
dist/web3research_etl_spark.zip``; a stale zip deploys old code while
the repo's tests pass against new code (this bit round 1:
``operators/text.py`` in the zip lacked ``canonical_url`` that
``__spark_entry__.py`` imported → ImportError only at deploy time).
This test byte-compares every tracked ``.py`` in the package against
the zip, so staleness fails the suite instead of the cluster.
Regenerate with ``make package``.
"""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
ZIP = REPO / "dist" / "web3research_etl_spark.zip"
PKG = REPO / "web3research_etl_spark"


def test_dist_zip_matches_source_tree():
    assert ZIP.exists(), "dist zip missing — run `make package`"
    with zipfile.ZipFile(ZIP) as z:
        names = set(z.namelist())
        tree = {
            p.relative_to(REPO).as_posix(): p.read_bytes()
            for p in PKG.rglob("*.py")
            if "__pycache__" not in p.parts
        }
        # every source file present and byte-identical
        stale = []
        for rel, body in sorted(tree.items()):
            if rel not in names:
                stale.append(f"missing from zip: {rel}")
            elif z.read(rel) != body:
                stale.append(f"stale in zip: {rel}")
        # no orphan modules shipped that the tree deleted
        for n in sorted(names):
            if n.endswith(".py") and n not in tree:
                stale.append(f"orphan in zip: {n}")
        assert not stale, "dist zip out of date — run `make package`:\n" + "\n".join(stale)
