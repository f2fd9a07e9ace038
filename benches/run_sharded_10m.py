"""The 10M flagship, sharded: 16 equal shards, EXACT fused kernel per shard.

Reference headline (BASELINE.md): n=10,120,191 laion2B sketches — build
575.21s on 16 CPU threads, 26.4k QPS at recall@10 0.93356 (ef=64).

Single-chip physics cap the exact-distance paths at 10M (no inline table
fits HBM; random 128B gathers run ~93ns/row — docs/SCALE.md). The
production answer is index sharding over a TPU mesh
(parallel/sharded.py: queries broadcast, per-shard search, all_gather
top-k merge — validated by __graft_entry__.dryrun_multichip): each shard
of 10.12M/16 = 632,512 points is BELOW the fused-kernel limits (packed
int32 keys need n <= 2^20; table 8.7KB/node -> 5.5GB), so every shard
searches with full-precision distances in VMEM.

With ONE physical chip this script runs the 16 shards SEQUENTIALLY:
build each shard, query ALL queries against it with the fused kernel,
free it, and merge per-shard top-k exactly at the end — the same math
the mesh runs in parallel. Reported:
  * recall@10: TRUE global recall vs the host exact oracle on 10.12M
  * per-shard QPS: measured on the real chip (distribution over shards)
  * aggregate QPS: min per-shard QPS = the mesh throughput (each chip
    serves every query; the all_gather merge of [B, k] keys is
    microseconds on ICI), reported as `projected_16chip`
  * sequential 1-chip QPS: NQ / total query wall-clock, reported as
    `value` (the honest single-chip number for this script)

Writes benches/results_sharded_10m.json.

Usage: python benches/run_sharded_10m.py [n_shards] [N_total]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASELINE_QPS = 26_400


def main():
    from hnsw_itu_tpu.utils.compile_cache import enable
    from hnsw_itu_tpu.utils.tunnel import require_device

    enable()
    require_device()  # dead relay = infinite hang at first device contact
    import jax.numpy as jnp

    from hnsw_itu_tpu.models import IndexOptions
    from hnsw_itu_tpu.models.hnsw import HNSWBuilder
    from hnsw_itu_tpu.utils import recall_at_k

    SH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_120_192
    N = -(-N // SH) * SH  # equal shards -> one compiled program for all
    PER = N // SH
    NQ, K, NGT = 10_000, 10, 2048
    # BENCH_EF: comma list — each built shard is queried at EVERY ef
    # (builds dominate ~1500s total; one extra ef costs ~5s across all
    # shards), merged/reported per ef; the headline is the fastest ef
    # meeting the 0.93 recall gate. BENCH_W: shard max degree (32 halves
    # the fused table and enables the span-32 packed kernel at ef<=32).
    EFS = [int(x) for x in os.environ.get("BENCH_EF", "48,32").split(",")]
    W = int(os.environ.get("BENCH_W", 64))

    t_start = time.perf_counter()
    # multi-scale clustered sketches (navigable LAION proxy; the flat
    # generator made per-shard navigation structurally impossible at this
    # leaf density — see hnsw_itu_tpu/utils/synth.py)
    from hnsw_itu_tpu.utils.synth import make_dataset

    pts, qs = make_dataset(0, N, NQ)
    print(f"# data generated at {time.perf_counter()-t_start:.0f}s",
          file=sys.stderr, flush=True)

    from hnsw_itu_tpu.utils.tunnel import contact_watchdog

    disarm = contact_watchdog()
    np.asarray(jnp.asarray(np.ones((4096, 128), np.uint32)) + 1)
    disarm()
    print(f"# device session up at {time.perf_counter()-t_start:.0f}s",
          file=sys.stderr, flush=True)

    bench_dir = os.path.dirname(os.path.abspath(__file__))

    # -- crash resumability: shards are independent, and only their query
    # RESULTS feed the final merge — so the checkpoint is just the filled
    # result columns (~25MB), written after every shard. A restarted run
    # regenerates the (seeded) data, restores the columns + ground truth,
    # and continues from the first unbuilt shard.
    ckpt_path = os.path.join(bench_dir, f"ckpt_sharded_{N}_{SH}.npz")
    resume_ok = (os.environ.get("BENCH_RESUME", "1") == "1"
                 and os.path.exists(ckpt_path))
    z = np.load(ckpt_path) if resume_ok else None
    if z is not None and ("efs" not in z or list(z["efs"]) != EFS
                          or int(z.get("w", 64)) != W):
        print("# ignoring checkpoint (ef sweep / W config changed)",
              file=sys.stderr, flush=True)
        z = None

    from hnsw_itu_tpu import native

    if z is not None:
        gt_ids = z["gt_ids"]
        print(f"# resumed: {int(z['s_done'])}/{SH} shards from checkpoint",
              file=sys.stderr, flush=True)
    else:
        t0 = time.perf_counter()
        _, gt_ids = native.host_bruteforce(pts, "hamming", qs[:NGT], K)
        print(f"# ground truth ({NGT} queries, host): "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    qs_dev = jnp.asarray(qs)
    opts = IndexOptions(ef_construction=96, connections=24,
                        max_connections=W, size=PER, batch_size=256,
                        host_warmup=min(20_000, PER))

    # per-(ef, shard) results, merged exactly at the end: distances are
    # the global tie-break key, ids carry the shard offset back to global
    NE = len(EFS)
    if z is not None:
        s_start = int(z["s_done"])
        all_d, all_i = z["all_d"], z["all_i"]
        build_times = [float(x) for x in z["build_times"]]
        query_times = [[float(x) for x in row] for row in z["query_times"]]
        paths = str(z["paths"])
    else:
        s_start = 0
        all_d = np.full((NE, NQ, SH * K), np.iinfo(np.int32).max, np.int64)
        all_i = np.full((NE, NQ, SH * K), -1, np.int64)
        build_times = []
        query_times = [[] for _ in range(NE)]
        paths = "xla"
    out_name = ("results_sharded_10m.json" if N >= 1_000_000
                else "results_sharded_smoke.json")
    out_path = os.path.join(bench_dir, out_name)

    for s in range(s_start, SH):
        lo = s * PER
        shard_pts = pts[lo : lo + PER]
        t0 = time.perf_counter()
        b = HNSWBuilder(opts, metric="hamming")
        b.extend_batched(shard_pts)
        index = b.build()
        np.asarray(index.base.deg[:1])  # drain
        bt = time.perf_counter() - t0
        build_times.append(bt)

        index.query_batch = 8192
        index.query_entry_sample = 1024
        index.enable_inline()
        path = "fused" if index.fused is not None else (
            f"mini(mw={index.mini_words})" if index.mini is not None
            else "xla")
        for e, ef in enumerate(EFS):
            index.max_steps = ef
            index.knns(qs_dev[:8192], K, ef)  # compile (cached after s=0)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = index.knns(qs_dev, K, ef)
                np.asarray(res.ids[:1])
                best = min(best, time.perf_counter() - t0)
            query_times[e].append(best)
            d = np.asarray(res.dists).astype(np.int64)
            i = np.asarray(res.ids).astype(np.int64)
            # invalid slots come back as ID_INF (int32 max), not negative
            ok = (i >= 0) & (i < np.iinfo(np.int32).max)
            all_d[e, :, s * K : (s + 1) * K] = np.where(
                ok, d, np.iinfo(np.int32).max)
            all_i[e, :, s * K : (s + 1) * K] = np.where(ok, i + lo, -1)
            print(f"# shard {s} ef={ef}: build {bt:.1f}s, query {best:.3f}s "
                  f"({NQ/best:.0f} QPS), path={path}",
                  file=sys.stderr, flush=True)
            del res
        paths = path
        del index, b
        # partial record survives a kill — in a SIDE file, so an aborted
        # run never clobbers the last committed full artifact
        with open(out_path + ".partial", "w") as f:
            json.dump({"status": f"shard {s+1}/{SH}",
                       "build_times": [round(x, 1) for x in build_times]},
                      f)
        tmp = ckpt_path + ".tmp.npz"
        np.savez(tmp, s_done=np.int64(s + 1),
                 efs=np.asarray(EFS, np.int64), w=np.int64(W),
                 all_d=all_d, all_i=all_i, gt_ids=gt_ids,
                 build_times=np.asarray(build_times),
                 query_times=np.asarray(query_times), paths=paths)
        os.replace(tmp, ckpt_path)

    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)  # all shards done; don't leak into a rerun

    # exact merge per ef: per-query sort of SH*K (distance, id) pairs
    build_total = sum(build_times)
    sweep = []
    best_rec = None
    for e, ef in enumerate(EFS):
        order = np.lexsort((all_i[e], all_d[e]), axis=1)[:, :K]
        merged = np.take_along_axis(all_i[e], order, axis=1)
        recall = float(recall_at_k(merged[:NGT], gt_ids, K))
        shard_qps = [NQ / t for t in query_times[e]]
        seq_qps = NQ / sum(query_times[e])
        agg_qps = min(shard_qps)
        rec = {
            "metric": f"HNSW 10M sharded (k={K}, ef={ef}, n={N}, {SH} "
                      f"shards x {PER}, W={W}, {paths} per shard, "
                      "synthetic 1024-bit sketches)",
            "value": round(seq_qps, 1),
            "unit": "qps",
            "vs_baseline": round(seq_qps / BASELINE_QPS, 3),
            "recall_at_10": round(recall, 4),
            "build_seconds": round(build_total, 1),
            "build_seconds_parallel_projection": round(max(build_times), 1),
            "n_points": N,
            "n_queries": NQ,
            "n_shards": SH,
            "projected_16chip_qps": round(agg_qps, 1),
            "projected_16chip_vs_baseline": round(agg_qps / BASELINE_QPS, 3),
            "shard_qps_min_med_max": [round(min(shard_qps), 1),
                                      round(sorted(shard_qps)[SH // 2], 1),
                                      round(max(shard_qps), 1)],
            "query_path": f"{paths}-per-shard + exact host merge",
        }
        sweep.append({"ef": ef, "recall_at_10": rec["recall_at_10"],
                      "projected_16chip_qps": rec["projected_16chip_qps"],
                      "seq_qps": rec["value"], "_rec": rec})
    # headline: fastest projected-mesh config meeting the 0.93 gate,
    # else the highest-recall one
    gated = [s for s in sweep if s["recall_at_10"] >= 0.93]
    pick = (max(gated, key=lambda s: s["projected_16chip_qps"]) if gated
            else max(sweep, key=lambda s: s["recall_at_10"]))
    best_rec = pick["_rec"]
    for s in sweep:
        del s["_rec"]
    best_rec["ef_sweep"] = sweep
    print(json.dumps(best_rec))
    with open(out_path, "w") as f:
        json.dump(best_rec, f, indent=1)
    if os.path.exists(out_path + ".partial"):
        os.remove(out_path + ".partial")


if __name__ == "__main__":
    main()
