"""Machine-ceiling calibration for SCALING.md: how well does this box
scale PURE-PYTHON work of the flagship's shape (csv parse + URI string
building) from N to 4N worker processes, with no Spark/JVM involved?

If this number is high (~0.95 measured on the sandbox box at 2->8) the
hardware is not the limit, and any Spark-side shortfall in
tools/bench_scaling.py is attributable to the plan/runtime - which is the
point of calibrating before tuning.

Usage: python tools/calib_machine.py [total_pages] [N] [fourN]
"""

import csv
import io
import sys
import time
from concurrent.futures import ProcessPoolExecutor

PAGE = "doc_id,lang,source,n_chars,text\n" + "\n".join(
    f'{i},en,web,{i * 7},"some document text with, commas and '
    f'""quotes"" {i} pad pad pad pad pad pad pad pad"'
    for i in range(10)) + "\n"


def work(n_pages: int) -> int:
    total = 0
    for _ in range(n_pages):
        rows = list(csv.reader(io.StringIO(PAGE)))
        hdr = rows[0]
        for r in rows[1:]:
            for c, _v in zip(hdr, r):
                s = ("http://pages.example.org/doc/" + r[0] + "#" + c
                     + "|" + _v)
                total += len(s)
    return total


def run(workers: int, total_pages: int) -> float:
    per = total_pages // workers
    t0 = time.time()
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(work, [per] * workers))
    return time.time() - t0


def main():
    total_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 480000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    work(2000)  # warm
    thr = {}
    for w in (n_low, n_high):
        best = min(run(w, total_pages) for _ in range(3))
        thr[w] = total_pages / best
        print(f"workers={w} wall={best:.2f}s pages/sec={thr[w]:.0f}")
    eff = thr[n_high] / ((n_high / n_low) * thr[n_low])
    print(f"machine ceiling eff {n_low}->{n_high}: {eff:.3f}")


if __name__ == "__main__":
    main()
