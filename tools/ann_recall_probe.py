#!/usr/bin/env python
"""ANN recall@k audit at sf1 scale (VERDICT r7 item 8 / r8 item 5).

The LSH / IVF / PQ top-k retrieval paths are graded on PLAN shape in
PLANS.md, but an index that prunes 10x and returns the wrong neighbors
is not an index. This probe measures what the plans cannot: recall@10
of each approximate path against brute-force ground truth, on a
synthesized sf1-scale embeddings corpus (10x the sf0.1 table = 20k
vectors, dim 64). Replicas are deterministically perturbed
(emb[j] += 0.005 * r * sin(31*vec_id + 7*j)) so the corpus is 10x
DISTINCT vectors, not 10 identical copies — identical copies would
hand every method its own duplicates as free neighbors and overstate
recall.

Methodology: 100 query vectors (the base replica's vec_id < 100),
k=10, truth = brute_force_topk on the full corpus; each method's
recall@10 = |approx ∩ truth| / (100 * 10). The approximate paths run
with their REGISTRY-default parameters (lsh: 6 planes + multi-probe;
ivf: 16 centroids, 4 probes; pq: m=8, ks=16 ADC) so the number audits
the shipped configuration, not a tuned one.

Appends a section to SCALING.md. Usage:
    python tools/ann_recall_probe.py [out_md]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hw_kafka_streams_spark.cache import release_managed_caches  # noqa: E402
from hw_kafka_streams_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/embeddings.parquet"
REPLICAS = 10
N_QUERIES = 100
K = 10


def synthesize(spark):
    emb = spark.read.parquet(SRC)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = spark.range(REPLICAS).withColumnRenamed("id", "_r")
    vid = F.col("vec_id") + F.col("_r") * max_id
    jittered = F.transform(
        "embedding",
        lambda x, j: (
            x
            + 0.005
            * F.col("_r").cast("float")
            * F.sin(31 * F.col("vec_id") + 7 * j)
        ).cast("float"),
    )
    return (
        emb.crossJoin(F.broadcast(reps))
        .select(
            vid.alias("vec_id"),
            jittered.alias("embedding"),
            F.col("label"),
        )
    )


def pairs(df) -> set:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALING.md"
    spark = get_spark("ann_recall_probe")
    from hw_kafka_streams_spark.operators import similarity as S

    corpus = synthesize(spark)
    corpus.persist().count()
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)

    t0 = time.perf_counter()
    truth = pairs(S.brute_force_topk(queries, corpus, k=K))
    t_bf = time.perf_counter() - t0
    denom = len(truth)

    rows = []
    methods = {
        "lsh_topk (auto planes via lsh_planes_for)": lambda: S.lsh_topk(
            queries, corpus, k=K
        ),
        "ivf_topk (auto geometry via ivf_geometry_for)": lambda: S.ivf_topk(
            queries, corpus, k=K
        ),
        "pq_topk (m=8, ks=16 ADC)": lambda: S.pq_topk(
            queries, corpus, k=K,
            codebooks=S.pq_codebooks(corpus, m=8, ks=16),
        ),
    }
    for name, fn in methods.items():
        t0 = time.perf_counter()
        got = pairs(fn())
        dt = time.perf_counter() - t0
        recall = len(got & truth) / denom
        rows.append((name, recall, dt))
        release_managed_caches()

    n_corpus = corpus.count()
    ivf_c, ivf_p = S.ivf_geometry_for(n_corpus)
    lsh_pl, lsh_r = S.lsh_planes_for(n_corpus)
    lines = [
        "",
        "## ANN recall@10 audit, sf1-scale embeddings "
        "(tools/ann_recall_probe.py)",
        "",
        f"Corpus: {n_corpus} perturbed-replica vectors (10x sf0.1), "
        f"{N_QUERIES} queries, k={K}; truth = brute_force_topk "
        f"({t_bf:.1f}s). Recall = |approx ∩ truth| / {denom}. "
        "Registry-default parameters — the audit grades the shipped "
        "configuration. Auto geometry at this corpus size: "
        f"LSH {lsh_pl} planes / radius {lsh_r}; IVF {ivf_c} centroids "
        f"/ {ivf_p} probes (expected scan fraction "
        f"{ivf_p / ivf_c:.1%}).",
        "",
        "| method | recall@10 | wall |",
        "|---|---|---|",
    ]
    for name, recall, dt in rows:
        lines.append(f"| {name} | {recall:.3f} | {dt:.1f}s |")
    with open(out_md, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended ANN recall section to {out_md}")
    for name, recall, dt in rows:
        print(f"  {name:40s} recall@10={recall:.3f}  [{dt:5.1f}s]")


if __name__ == "__main__":
    main()
