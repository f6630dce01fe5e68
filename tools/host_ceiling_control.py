"""Host-ceiling control for the scaling numbers: the IDENTICAL per-doc
extraction work run with bare ``multiprocessing`` — no Spark, no Arrow,
no serialization — at two process counts.  Whatever efficiency this
measures is the ceiling ANY engine can reach on this host for this
workload; the Spark job is graded against it, not against an ideal 1.0
(BENCH.md "host's own scaling ceiling").

Usage: python tools/host_ceiling_control.py [n_docs] [low_procs] [high_procs]
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time

sys.path.insert(0, ".")


def work(bounds: tuple[int, int]) -> int:
    lo, hi = bounds
    from legal_ner_spark import synth
    from legal_ner_spark.core.extract import extract_document
    n = 0
    for i in range(lo, hi):
        d = synth.gen_doc(i)
        r = extract_document(d["doc_id"], synth.assemble_text(d["spans"]))
        n += len(r.triples)
    return n


def run(procs: int, n_docs: int) -> float:
    chunks = [(i * n_docs // procs, (i + 1) * n_docs // procs)
              for i in range(procs)]
    with mp.Pool(procs) as pool:
        pool.map(work, [(0, 1)] * procs)   # warm: import + regex compile
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            pool.map(work, chunks)
            best = min(best, time.time() - t0)
    return n_docs / best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    r_low = run(low, n)
    r_high = run(high, n)
    eff = (r_high / r_low) / (high / low)
    print(f"{low} procs: {r_low:.1f} docs/s | {high} procs: "
          f"{r_high:.1f} docs/s | ceiling efficiency {eff:.3f}")


if __name__ == "__main__":
    main()
