"""Host input-pipeline scaling: aggregate decode+augment img/s vs worker
count, threads vs processes (VERDICT r2 item 8).

The question: the chip eats ~3500 img/s at 224² while one host core
decodes ~115 camera-sized img/s — does the prefetch layer actually
*scale* with workers, and do threads (cv2/numpy release the GIL) or
processes (the reference's 10-worker pool,
ilsvrc2017_cls_multithread.py:119-154) scale better on this host?

Measures the full training host path — JPEG decode → augment (flip/HSV/
crop/…) → batch assembly — through :class:`PrefetchLoader` (threads) and
:class:`ProcessPrefetchLoader` (processes) at 1/2/4 workers over a
synthetic ILSVRC tree. Prints one JSON line per row and a README table.

    python benchmarks/host_pipeline.py [--batches 12] [--batch-size 32]
        [--workers 1,2,4] [--no-processes]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests"))

_ROOT = os.environ.get("TFY2_HOSTBENCH_ROOT", "/tmp/tfy2_hostbench")
_BATCH = int(os.environ.get("TFY2_HOSTBENCH_BATCH", "32"))


def _ensure_tree() -> str:
    """A synthetic CLS tree with enough distinct JPEGs that the page
    cache, not a single hot file, is what repeats."""
    import synthetic

    root = os.path.join(_ROOT, "ILSVRC")
    marker = os.path.join(root, "ImageSets", "CLS-LOC", "train_cls.txt")
    if not os.path.exists(marker):
        print(f"generating synthetic CLS tree at {root}")
        synthetic.make_cls_pretrain(root, per_class=40, n_val=10)
    return root


def make_stream(worker_id: int, num_workers: int):
    """Per-worker producer for ProcessPrefetchLoader — top-level so it
    pickles under spawn. Each worker owns a private imdb seeded by its
    id (the shuffled-training-stream sharding discussed in
    data.prefetch.ProcessPrefetchLoader)."""
    from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls

    imdb = IlsvrcCls("train", batch_size=_BATCH, data_aug=True,
                     data_path=os.path.join(_ROOT, "ILSVRC"),
                     seed=worker_id)
    return imdb.get


def _measure(loader, batches: int, warmup: int = 2) -> float:
    it = iter(loader)
    n = 0
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(batches):
        n += len(next(it)[1])
    dt = time.perf_counter() - t0
    return n / dt


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--no-processes", action="store_true",
                    help="threads only (process spawn+imdb startup is "
                         "slow on a 1-core host)")
    args = ap.parse_args()
    workers = [int(w) for w in args.workers.split(",")]

    from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls
    from tensorflow_yolo2_tpu.data.prefetch import (
        PrefetchLoader,
        ProcessPrefetchLoader,
    )

    data_path = _ensure_tree()
    ncpu = os.cpu_count()
    rows = []

    # baseline: the bare sequential imdb (what the reference's
    # single-thread path pays, pascal_train_darknet.py:96)
    imdb = IlsvrcCls("train", batch_size=_BATCH, data_aug=True,
                     data_path=data_path)
    rate = _measure(iter(imdb.get, None), args.batches)
    rows.append({"mode": "sequential", "workers": 0,
                 "img_per_s": round(rate, 1)})
    print("ROW " + json.dumps(rows[-1]))

    for nw in workers:
        imdb = IlsvrcCls("train", batch_size=_BATCH, data_aug=True,
                         data_path=data_path)
        with PrefetchLoader(imdb.get, num_workers=nw, prefetch_size=4,
                            thread_safe=True) as loader:
            rate = _measure(loader, args.batches)
        rows.append({"mode": "threads", "workers": nw,
                     "img_per_s": round(rate, 1)})
        print("ROW " + json.dumps(rows[-1]))

    if not args.no_processes:
        for nw in workers:
            with ProcessPrefetchLoader(make_stream, num_workers=nw,
                                       prefetch_size=4) as loader:
                rate = _measure(loader, args.batches)
            rows.append({"mode": "processes", "workers": nw,
                         "img_per_s": round(rate, 1)})
            print("ROW " + json.dumps(rows[-1]))

    print(f"\nhost: {ncpu} cpu core(s); batch {_BATCH}, "
          f"{args.batches} timed batches, full decode+augment path")
    print("\n| mode | workers | img/s |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['mode']} | {r['workers']} | {r['img_per_s']} |")


if __name__ == "__main__":
    main()
