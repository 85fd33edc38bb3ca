"""Single exit-coded verification gate for the whole repo:

1. full ``check_contract`` sweep — every ``queries()`` entry vs its
   DuckDB oracle at the given scale factor;
2. ``explain_audit`` — the physical-plan asserts (partition pruning,
   pushed filters, TakeOrderedAndProject, broadcast joins);
3. a FRESH index build + ``check_index`` — the CheckIndex invariants
   (term/collection stats agreement, block decode, dv-delta windows,
   snapshot refs) on an index built from scratch this run.

Usage: python tools/verify_all.py [sf_dir] [--skip-contract]
Exit 0 only if every stage passes.  ~10-15 min for the full sweep at
sf0.01; ``--skip-contract`` runs just the build gates (~3 min).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage(name: str, argv: list[str]) -> bool:
    print(f"\n=== {name}: {' '.join(argv)}")
    t0 = time.time()
    rc = subprocess.call(argv, cwd=REPO)
    print(f"=== {name}: {'OK' if rc == 0 else f'FAIL (exit {rc})'} "
          f"[{time.time() - t0:.0f}s]")
    return rc == 0


def _fresh_build_check() -> bool:
    from lucene_1_spark import corpus as corpus_mod
    from lucene_1_spark.index import IndexReader, build_index
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.index.check import check_index
    from lucene_1_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("verify-all-build", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="verify_all_idx_")
    ok = True
    try:
        src = spark.createDataFrame(corpus_mod.t_small()).repartition(8,
                                                                      "repo")
        build_index(spark, src, tmp,
                    IndexConfig(n_buckets=8, n_doc_partitions=8,
                                positions=True))
        results = check_index(IndexReader(spark, tmp), source=src)
        for name, (passed, msg) in results.items():
            tag = "ok" if passed else "FAIL"
            print(f"  check_index.{name}: {tag} ({msg})")
            ok = ok and passed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(f"=== fresh-build check_index: {'OK' if ok else 'FAIL'} "
          f"[{time.time() - t0:.0f}s]")
    return ok


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    ok = True
    if "--skip-contract" not in sys.argv:
        ok &= _stage("contract sweep",
                     [sys.executable, "tools/check_contract.py", sf_dir])
    ok &= _stage("plan audit", [sys.executable, "tools/explain_audit.py"])
    ok &= _fresh_build_check()
    print(f"\nverify_all: {'ALL GREEN' if ok else 'FAILURES'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
