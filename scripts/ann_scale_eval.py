#!/usr/bin/env python
"""ANN recall/selectivity evaluation at 1M+ DISTINCT vectors.

The parquet corpora carry 20 k distinct embeddings at every SF (clones
aside), so the ANN floors in ROWS_ONLY.md were attested at toy
cardinality only. This script generates ``--n`` (default 1,000,000)
distinct 64-dim vectors with the deterministic FNV-sin mock embedder
(same recipe as the engine: embedding of the string 'vec-<i>'),
runs every approximate index family against the exact brute-force
top-k on ``--queries`` query vectors, and reports mean recall@k and
the scanned/candidate fraction — the two numbers that decide whether
an index is worth its build cost at 100 TB.

Families measured (configs = the registered queries' configs, plus a
scale-tuned variant where the registered one is toy-sized):
- SRP-LSH multitable  L=16 × 6 bits (emb_ann_lsh_topk's config)
- SRP-LSH single-table 16 bits, Hamming-≤2 multiprobe (close regime)
- IVF  16 lists / 3 probed (emb_ann_ivf_topk's config)
- IVF  256 lists / 8 probed (the 1M-scale config)
- IVF-PQ  256 lists / 8 probed, PQ-ADC shortlist + exact re-rank

Usage: python scripts/ann_scale_eval.py [--n N] [--queries Q] [--k K]
           [--out FILE] [--corpus DIR]
The corpus parquet is cached in --corpus (default /tmp/ann_scale_emb)
and reused across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F

from the_hive_spark.functions.embedding import mock_embedding_np
from the_hive_spark.session import get_spark

DIM = 64


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag: str, default):
        return type(default)(argv[argv.index(flag) + 1]) if flag in argv else default

    n = opt("--n", 1_000_000)
    n_q = opt("--queries", 20)
    k = opt("--k", 10)
    out_path = opt("--out", "")
    corpus_dir = opt("--corpus", "/tmp/ann_scale_emb")

    spark = get_spark(app_name="ann-scale-eval")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    marker = os.path.join(corpus_dir, "_SUCCESS")
    if not os.path.exists(marker):
        from the_hive_spark.functions.embedding import make_mock_embedder

        embed = make_mock_embedder(DIM)
        (
            spark.range(n)
            .withColumnRenamed("id", "vec_id")
            .repartition(sc.defaultParallelism)
            .withColumn("embedding", embed(F.format_string("vec-%d", "vec_id")))
            .withColumn("label", (F.col("vec_id") % 10).cast("int"))
            .write.mode("overwrite")
            .parquet(corpus_dir)
        )
    emb = spark.read.parquet(corpus_dir)
    n_actual = emb.count()
    print(f"corpus: {n_actual} distinct vectors, dim {DIM}", flush=True)

    queries = {
        j: [float(x) for x in mock_embedding_np(f"query-{j}", DIM)]
        for j in range(n_q)
    }

    from the_hive_spark.operators.similarity import cosine_topk

    def exact_topk(qv):
        return [
            r["vec_id"] for r in cosine_topk(emb, qv, k=k).collect()
        ]

    print("computing exact ground truth...", flush=True)
    t0 = time.perf_counter()
    truth = {j: set(exact_topk(qv)) for j, qv in queries.items()}
    exact_sec = time.perf_counter() - t0

    results = {"n_vectors": n_actual, "dim": DIM, "k": k, "n_queries": n_q,
               "exact_scan_sec_per_query": round(exact_sec / n_q, 2),
               "families": {}}

    def record(name, recalls, fractions, secs):
        results["families"][name] = {
            "mean_recall": round(float(np.mean(recalls)), 3),
            "min_recall": round(float(np.min(recalls)), 3),
            "mean_scanned_fraction": round(float(np.mean(fractions)), 4),
            "sec_per_query": round(float(np.mean(secs)), 2),
        }
        print(f"{name}: {results['families'][name]}", flush=True)

    # ---------------------------------------------------- SRP-LSH L=16x6
    from the_hive_spark.functions.lsh import (
        ann_topk_lsh,
        hyperplanes,
        ivf_build,
        ivf_topk,
        multitable_signature_udf,
        signature_bits,
        simhash_signature_udf,
    )

    # candidate fraction measured once per config via the same filter
    # the search uses (counting per query would double the scan cost)
    def lsh_eval(n_planes, n_tables, probe_distance, tag):
        recalls, fractions, secs = [], [], []
        for j, qv in queries.items():
            t0 = time.perf_counter()
            got = {
                r["vec_id"]
                for r in ann_topk_lsh(
                    emb, qv, k=k, n_planes=n_planes,
                    probe_distance=probe_distance, n_tables=n_tables,
                ).collect()
            }
            secs.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[j]) / k)
            # matched-set size for the fraction
            q = np.array(qv)
            if n_tables == 1:
                planes = hyperplanes(DIM, n_planes)
                from the_hive_spark.functions.lsh import _probe_buckets

                q_sig = int(signature_bits(q[None, :], planes)[0])
                probes = _probe_buckets(q_sig, n_planes, probe_distance)
                udf = simhash_signature_udf(n_planes)
                m = emb.withColumn("_b", udf(F.col("embedding"))).filter(
                    F.col("_b").isin(probes)
                ).count()
            else:
                q_sigs = [
                    int(signature_bits(
                        q[None, :], hyperplanes(DIM, n_planes, 0x48495645 + t)
                    )[0])
                    for t in range(n_tables)
                ]
                udf = multitable_signature_udf(n_tables, n_planes)
                q_arr = F.array(*[F.lit(s) for s in q_sigs])
                m = (
                    emb.withColumn("_sigs", udf(F.col("embedding")))
                    .withColumn("_qsigs", q_arr)
                    .filter(F.expr(
                        "exists(zip_with(_sigs, _qsigs, (a, b) -> a = b),"
                        " x -> x)"
                    ))
                    .count()
                )
            fractions.append(m / n_actual)
        record(tag, recalls, fractions, secs)

    from the_hive_spark.functions.lsh import ivf_auto_params, lsh_auto_params

    lsh_eval(6, 16, 0, "srp_lsh_L16x6")
    lsh_eval(16, 1, 2, "srp_lsh_16bit_probe2")
    # the REGISTERED code path: auto-sized from measured cardinality
    # (what emb_ann_lsh_topk actually runs at this n)
    ap = lsh_auto_params(n_actual)
    lsh_eval(
        ap["n_planes"], ap["n_tables"], ap["probe_distance"],
        f"srp_lsh_auto[{ap['n_tables']}x{ap['n_planes']}"
        f"p{ap['probe_distance']}]",
    )

    # --------------------------------------------------------------- IVF
    def ivf_eval(n_clusters, n_probe, tag):
        t0 = time.perf_counter()
        assigned, centroids = ivf_build(emb, n_clusters=n_clusters)
        assigned = assigned.persist()
        sizes = {
            r["_cluster"]: r["count"]
            for r in assigned.groupBy("_cluster").count().collect()
        }
        build_sec = time.perf_counter() - t0
        recalls, fractions, secs = [], [], []
        for j, qv in queries.items():
            t0 = time.perf_counter()
            got = {
                r["vec_id"]
                for r in ivf_topk(
                    assigned, centroids, qv, k=k, n_probe=n_probe
                ).collect()
            }
            secs.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[j]) / k)
            qn = np.array(qv) / np.linalg.norm(qv)
            sims = []
            for i, c in enumerate(centroids):
                cv = np.array(c)
                nrm = np.linalg.norm(cv)
                sims.append((float(cv @ qn / nrm) if nrm else -1.0, i))
            probe = [i for _, i in sorted(sims, reverse=True)[:n_probe]]
            fractions.append(sum(sizes.get(i, 0) for i in probe) / n_actual)
        record(tag, recalls, fractions, secs)
        results["families"][tag]["build_sec"] = round(build_sec, 1)
        assigned.unpersist()

    ivf_eval(16, 3, "ivf_16_probe3")
    ivf_eval(256, 8, "ivf_256_probe8")
    # the REGISTERED code path (emb_ann_ivf_topk's auto-sized config)
    ip = ivf_auto_params(n_actual)
    ivf_eval(
        ip["n_clusters"], ip["n_probe"],
        f"ivf_auto[{ip['n_clusters']}_probe{ip['n_probe']}]",
    )

    # ------------------------------------------------------------ IVF-PQ
    from the_hive_spark.functions.pq import (
        pq_adc_rerank_topk,
        pq_encode,
        pq_train,
    )

    t0 = time.perf_counter()
    assigned, centroids = ivf_build(emb, n_clusters=256)
    codebooks = pq_train(emb)  # FAISS-style bounded sample (65,536)
    codes = pq_encode(emb, codebooks)
    coded = (
        codes.join(assigned.select("vec_id", "_cluster"), "vec_id")
        .persist()
    )
    sizes = {
        r["_cluster"]: r["count"]
        for r in coded.groupBy("_cluster").count().collect()
    }
    build_sec = time.perf_counter() - t0
    recalls, fractions, secs = [], [], []
    for j, qv in queries.items():
        t0 = time.perf_counter()
        qn = np.array(qv) / np.linalg.norm(qv)
        sims = []
        for i, c in enumerate(centroids):
            cv = np.array(c)
            nrm = np.linalg.norm(cv)
            sims.append((float(cv @ qn / nrm) if nrm else -1.0, i))
        probe = [i for _, i in sorted(sims, reverse=True)[:8]]
        shortlist = coded.filter(F.col("_cluster").isin(probe))
        got = {
            r["vec_id"]
            for r in pq_adc_rerank_topk(
                shortlist, emb, codebooks, qv, k=k, shortlist=1000 * k
            ).collect()
        }
        secs.append(time.perf_counter() - t0)
        recalls.append(len(got & truth[j]) / k)
        fractions.append(sum(sizes.get(i, 0) for i in probe) / n_actual)
    record("ivfpq_256_probe8_adc", recalls, fractions, secs)
    results["families"]["ivfpq_256_probe8_adc"]["build_sec"] = round(
        build_sec, 1
    )
    coded.unpersist()

    print(json.dumps(results), flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
